"""Deterministic synthetic source-code corpus generator.

Produces the BASELINE.json ``input_hint`` table — Parquet columns
``(repo: string, path: string, commit: string, lang: string,
content: string)`` — with the properties FIXTURES.md §1 asks for:

- a closed symbol pool so gold triples are enumerable;
- ONE mega-repo owning ~30% of rows (skew / salting tests);
- ≥90% python plus javascript and go files;
- deliberately messy surface forms the correction chain must fix
  (``def fn (`` spacing → strip_annotations; ``if (x):`` keyword call
  false-positives → fix_annotations; lowercase raw labels → upcase;
  overlapping DEF/CALL spans → filter_overlaps) — the analogue of the
  reference's deliberately inconsistent skills corpus
  (tests/conftest.py:37-79: mixed-case ``skill``/``SKILL``, overlaps);
- a handful of empty / no-mention files (analogue of the 29 no-entity
  examples, tests/test_stats.py:22) and a few ≥256 KB files
  (block-size / wide-row handling).

Everything is seeded; same (n_files, seed) → byte-identical corpus.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from recon_ray.hashing import stable_u64

PACKAGES_PY = [
    "numpy", "pandas", "requests", "flask", "torch", "json", "os", "sys",
    "re", "math", "collections", "itertools", "pathlib", "typing", "functools",
]
PACKAGE_MEMBERS = {
    "numpy": ["array", "zeros", "dot"],
    "pandas": ["DataFrame", "read_csv", "concat"],
    "collections": ["defaultdict", "Counter", "OrderedDict"],
    "itertools": ["chain", "product"],
    "functools": ["reduce", "partial"],
    "math": ["floor", "sqrt"],
    "json": ["loads", "dumps"],
    "os": ["getcwd"],
    "re": ["compile"],
    "typing": ["Optional"],
    "pathlib": ["Path"],
    "requests": ["get", "post"],
    "flask": ["Flask"],
    "torch": ["tensor"],
    "sys": ["exit"],
}
PACKAGES_JS = ["lodash", "react", "express", "axios", "moment"]
PACKAGES_GO = ["fmt", "strings", "errors", "net/http", "encoding/json"]

FN_NAMES = [
    "alpha", "beta", "gamma", "delta", "process", "handle", "load", "parse",
    "run", "compute", "merge", "fetch", "train", "score", "split", "clean",
]
VAR_NAMES = ["x1", "out", "result", "data", "tmp", "acc", "buf", "val"]


def _commit_for(repo: str, seed: int) -> str:
    h1 = stable_u64("commit", repo, seed)
    h2 = stable_u64("commit2", repo, seed)
    return f"{h1:016x}{h2:016x}{h1 ^ h2:08x}"[:40].ljust(40, "0")


def _python_file(rng: random.Random, module_fns: list[str], repo_fns: list[str]) -> str:
    pkgs = rng.sample(PACKAGES_PY, k=rng.randint(2, 4))
    lines = [f'"""synthetic module"""']
    for i, p in enumerate(pkgs):
        if i == 1 and p in PACKAGE_MEMBERS:
            lines.append(f"from {p} import {rng.choice(PACKAGE_MEMBERS[p])}")
        else:
            lines.append(f"import {p}")
    lines.append("")
    p0 = pkgs[0]
    member0 = rng.choice(PACKAGE_MEMBERS.get(p0, ["call"]))
    # sometimes name the variable after a pool function → plants the
    # same-text-different-label (IDENT vs CALL) disparity pairs the
    # reference's fixtures rely on (tests/test_corrections.py:36-53)
    var0 = rng.choice(FN_NAMES[:6]) if rng.random() < 0.3 else rng.choice(VAR_NAMES)
    lines.append(f"{var0} = {p0}.{member0}({rng.randint(1, 99)})")
    lines.append("")
    for i, fn in enumerate(module_fns):
        # messy spacing before "(" on some defs/calls → exercises
        # strip_annotations + filter_overlaps
        sp = " " if rng.random() < 0.3 else ""
        lines.append(f"def {fn}{sp}(x):")
        callee = rng.choice(repo_fns) if repo_fns and rng.random() < 0.7 else None
        v = rng.choice(VAR_NAMES)
        if callee:
            csp = " " if rng.random() < 0.25 else ""
            lines.append(f"    {v} = {callee}{csp}(x)")
        else:
            pm = rng.choice(PACKAGE_MEMBERS.get(p0, ["call"]))
            lines.append(f"    {v} = {p0}.{pm}(x)")
        if rng.random() < 0.4:
            lines.append("    if (x):")  # keyword call false-positive
            lines.append(f"        return {v}")
        lines.append(f"    return {v}")
        lines.append("")
    if rng.random() < 0.3 and module_fns:
        lines.append(f"print({module_fns[0]}({rng.randint(1, 9)}))")
    return "\n".join(lines) + "\n"


def _js_file(rng: random.Random, module_fns: list[str], repo_fns: list[str]) -> str:
    p1, p2 = rng.sample(PACKAGES_JS, k=2)
    lines = [
        f"const {p1} = require('{p1}')",
        f"import widget from '{p2}'",
        "",
    ]
    for fn in module_fns:
        lines.append(f"function {fn}(x) {{")
        callee = rng.choice(repo_fns) if repo_fns and rng.random() < 0.7 else None
        if callee:
            lines.append(f"  let out = {callee}(x)")
        else:
            lines.append(f"  let out = {p1}.map(x)")
        if rng.random() < 0.4:
            lines.append("  if (x) { return out }")
        lines.append("  return out")
        lines.append("}")
        lines.append("")
    return "\n".join(lines) + "\n"


def _go_file(rng: random.Random, module_fns: list[str], repo_fns: list[str]) -> str:
    pkg = rng.choice(PACKAGES_GO)
    lines = ["package synth", f'import "{pkg}"', ""]
    for fn in module_fns:
        name = fn.capitalize()
        lines.append(f"func {name}(x int) int {{")
        callee = rng.choice(repo_fns) if repo_fns and rng.random() < 0.6 else None
        if callee:
            lines.append(f"    y := {callee.capitalize()}(x)")
        else:
            lines.append("    y := x")
        if rng.random() < 0.4:
            lines.append("    if (y > 0) {")
            lines.append("        return y")
            lines.append("    }")
        lines.append("    return y")
        lines.append("}")
        lines.append("")
    return "\n".join(lines) + "\n"


def generate_corpus(n_files: int, seed: int = 42) -> pa.Table:
    """Deterministic files table (repo, path, commit, lang, content)."""
    rng = random.Random(seed)
    n_repos = max(3, n_files // 40)
    repos = ["org0/megarepo"] + [
        f"org{1 + i % 7}/repo{i}" for i in range(n_repos - 1)
    ]
    # mega-repo owns ~30% of files; the rest spread evenly
    alloc: list[str] = []
    n_mega = max(1, int(n_files * 0.3))
    alloc += ["org0/megarepo"] * n_mega
    others = repos[1:] or repos
    for i in range(n_files - n_mega):
        alloc.append(others[i % len(others)])

    # per-repo function namespace: each module defines 1-4 fns from the pool;
    # repo_fns accumulates so later files can call earlier modules' functions
    repo_mod_counter: dict[str, int] = {}
    repo_fns: dict[str, list[str]] = {}

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for fi, repo in enumerate(alloc):
        frng = random.Random(stable_u64("file", repo, fi, seed))
        mod_i = repo_mod_counter.get(repo, 0)
        repo_mod_counter[repo] = mod_i + 1
        r = frng.random()
        if r < 0.90:
            lang, ext = "python", "py"
        elif r < 0.95:
            lang, ext = "javascript", "js"
        else:
            lang, ext = "go", "go"
        path = f"src/mod{mod_i}.{ext}"
        known = repo_fns.setdefault(repo, [])
        kind = frng.random()
        if kind < 0.05:
            content = "" if frng.random() < 0.3 else "# notes only\n# nothing here\n"
        elif kind < 0.07:
            # oversized file: repeat a generated block to ≥256 KB, using the
            # generator matching the file's lang (a .js/.go file carrying
            # Python content would exercise the wrong pattern set)
            fns = frng.sample(FN_NAMES, k=2)
            if lang == "python":
                block = _python_file(frng, fns, known)
            elif lang == "javascript":
                block = _js_file(frng, fns, known)
            else:
                block = _go_file(frng, fns, known)
            reps = (256 * 1024) // max(1, len(block)) + 1
            content = block * reps
            known.extend(f for f in fns if f not in known)
        else:
            fns = frng.sample(FN_NAMES, k=frng.randint(1, 4))
            if lang == "python":
                content = _python_file(frng, fns, known)
            elif lang == "javascript":
                content = _js_file(frng, fns, known)
            else:
                content = _go_file(frng, fns, known)
            known.extend(f for f in fns if f not in known)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(_commit_for(repo, seed))
        rows["lang"].append(lang)
        rows["content"].append(content)

    return pa.table(
        {
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
        }
    )


def write_corpus(
    n_files: int, out_dir: str, seed: int = 42, files_per_fragment: int = 512
) -> str:
    """Write the corpus as a directory of Parquet fragments (so reads
    auto-parallelize over fragments; never one giant file)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(n_files, seed=seed)
    n = table.num_rows
    frag = 0
    for start in range(0, n, files_per_fragment):
        chunk = table.slice(start, files_per_fragment)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{frag:05d}.parquet"))
        frag += 1
    return out_dir
