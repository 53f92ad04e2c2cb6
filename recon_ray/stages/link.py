"""Entity-linker stage — the stateful actor-pool analogue of the
reference's ``EntityLinker`` (recon/linker.py:15-36): each actor holds the
shared symbol dictionary (broadcast ONCE via ``ray.put`` and fetched
zero-copy in ``__init__``) and scores CALL mentions against it, emitting
``(subj, pred, obj)`` triples.

Resolution rules live in the SPEC (recon_ray/spec.py SymbolDict.resolve):
same-module definition wins, else lexicographically-smallest in-repo
definition, else unresolved.

Scale note: the broadcast dictionary is the right shape while the global
DEF set fits comfortably in a worker heap (≲ tens of millions of symbols).
Beyond that, partition BOTH sides by ``repo`` (resolution is repo-local by
construction) and link inside ``groupby("repo").map_groups`` — same spec,
shuffle instead of broadcast; salting for mega-repos per SURVEY §4.2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from recon_ray import spec
from recon_ray.ops.mentions_io import mentions_parts

TRIPLE_FIELDS = [
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("content_sha256", pa.string()),
    ("extractor", pa.string()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


def resolve_call(symbols: dict, repo: str, module: str, name: str):
    """dict-shaped SymbolDict.resolve (symbols: repo → name → sorted [qualified])."""
    lst = symbols.get(repo, {}).get(name)
    if not lst:
        return None
    same = f"{repo}:{module}.{name}"
    if same in lst:
        return same
    return lst[0]


class TripleLinker:
    """map_batches(TripleLinker, fn_constructor_kwargs={"symbols_ref": ref},
    batch_format="pyarrow", concurrency=N).

    Consumes docs with corrected ``mentions``; emits the exploded triples
    table (drops ``content`` — only sha256 provenance travels on).
    """

    def __init__(self, symbols_ref):
        # one ray.get per actor: zero-copy read of the broadcast dictionary
        self.symbols = ray.get(symbols_ref) if symbols_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        lengths, text, start, end, label, _source = mentions_parts(batch)
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        commits = batch.column("commit").to_pylist()
        shas = batch.column("content_sha256").to_pylist()
        langs = batch.column("lang").to_pylist()

        cols: dict[str, list] = {name: [] for name, _ in TRIPLE_FIELDS}

        def emit(i, subj, pred, obj, st, ot):
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj"].append(obj)
            cols["subj_type"].append(st)
            cols["obj_type"].append(ot)
            cols["repo"].append(repos[i])
            cols["path"].append(paths[i])
            cols["commit"].append(commits[i])
            cols["content_sha256"].append(shas[i])
            cols["extractor"].append(spec.EXTRACTOR_TAG)

        boundaries = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=boundaries[1:])
        for i in range(len(repos)):
            lo, hi = int(boundaries[i]), int(boundaries[i + 1])
            if lo == hi:
                continue
            repo, path, lang = repos[i], paths[i], langs[i]
            module = spec.module_of(path)
            file_id = f"{repo}/{path}"
            current_def = None
            # mentions are start-sorted; tie-break (start,end,label) to match
            # the sequential oracle's iteration order exactly
            order = sorted(
                range(lo, hi), key=lambda j: (start[j], end[j], label[j])
            )
            for j in order:
                lbl = label[j]
                if lbl == "IMPORT":
                    emit(i, repo, "imports", spec.import_root(text[j], lang),
                         "repo", "package")
                    emit(i, file_id, "imports_module", text[j], "file", "module")
                elif lbl == "DEF":
                    name = spec.def_name(text[j])
                    current_def = spec.qualified(repo, module, name)
                    emit(i, file_id, "defines", current_def, "file", "function")
                elif lbl == "CALL":
                    subj = current_def or spec.qualified(
                        repo, module, spec.MODULE_SENTINEL
                    )
                    resolved = resolve_call(self.symbols, repo, module, text[j])
                    if resolved is not None:
                        emit(i, subj, "calls", resolved, "function", "function")
                    else:
                        emit(i, subj, "calls_unresolved", text[j],
                             "function", "ident")
        return pa.table(
            {name: pa.array(cols[name], typ) for name, typ in TRIPLE_FIELDS}
        )


def build_symbol_broadcast(symbol_rows: pa.Table):
    """Distinct (repo, module, name) rows → broadcast dict
    {repo: {name: sorted [qualified]}} → ray.put ref (read zero-copy by
    every linker actor; the dict ships once, not per batch)."""
    repos = symbol_rows.column("repo").to_pylist()
    modules = symbol_rows.column("module").to_pylist()
    names = symbol_rows.column("name").to_pylist()
    symbols: dict[str, dict[str, list[str]]] = {}
    for r, m, n in zip(repos, modules, names):
        lst = symbols.setdefault(r, {}).setdefault(n, [])
        q = spec.qualified(r, m, n)
        if q not in lst:
            lst.append(q)
    for r in symbols:
        for n in symbols[r]:
            symbols[r][n].sort()
    return ray.put(symbols), symbols
