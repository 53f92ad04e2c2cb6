"""Single-process reference extractor — the correctness oracle.

This is the in-repo analogue of the reference's sequential engine: one
process, plain Python loops over documents, exactly the style of
``Operation.__call__``'s per-Example loop (recon/operations.py:236-258).
The Ray Data pipeline (recon_ray/pipelines/kg.py) must reproduce its
emitted triples at P/R ≥ 0.95 (BASELINE.json); our tests assert exact
equality. Both consume the shared SPEC (recon_ray/spec.py) but implement
execution independently.

Correction-chain semantics are faithful ports of the reference:

- ``upcase_labels``            recon/validation.py:7-19
- ``rename_labels``            recon/corrections.py:12-25
- ``strip_annotations``        recon/corrections.py:142-176 (including its
  per-char elif quirk: a span that both starts and ends with the LAST strip
  char gets only its leading side stripped)
- ``filter_overlaps``          recon/validation.py:22-112 (chain-greedy
  longest-wins, ported verbatim)
- ``fix_annotations``          recon/corrections.py:28-95 (case-insensitive
  by default; to_label None deletes)
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from typing import Iterable, Optional

from recon_ray import spec
from recon_ray.spec import Mention, SymbolDict


# ---------------------------------------------------------------------------
# Detection
# ---------------------------------------------------------------------------


def detect_mentions(content: str, lang: str) -> list[Mention]:
    """Run every raw pattern for ``lang`` over the file content."""
    out: list[Mention] = []
    for raw_label, pattern, group in spec.PATTERNS.get(lang, []):
        for m in pattern.finditer(content):
            out.append(
                Mention(
                    text=m.group(group),
                    start=m.start(group),
                    end=m.end(group),
                    label=raw_label,
                    source=f"{lang}:{raw_label}",
                )
            )
    out.sort(key=lambda s: (s.start, s.end, s.label))
    return out


# ---------------------------------------------------------------------------
# Correction chain (reference-faithful row kernels)
# ---------------------------------------------------------------------------


def upcase_labels(mentions: list[Mention]) -> list[Mention]:
    for m in mentions:
        m.label = m.label.upper()
    return mentions


def rename_labels(mentions: list[Mention], label_map: dict[str, str]) -> list[Mention]:
    for m in mentions:
        m.label = label_map.get(m.label, m.label)
    return mentions


def strip_annotations(
    mentions: list[Mention], strip_chars: list[str] = spec.STRIP_CHARS
) -> list[Mention]:
    """Faithful port of recon/corrections.py:162-175 (same elif structure)."""
    for s in mentions:
        for ch in strip_chars:
            if not s.text:
                break
            if s.text.startswith(ch):
                c = s.text[0]
                while c in strip_chars:
                    s.text = s.text[1:]
                    s.start += 1
                    if not s.text:
                        break
                    c = s.text[0]
            elif s.text.endswith(ch):
                c = s.text[-1]
                while c in strip_chars:
                    s.text = s.text[:-1]
                    s.end -= 1
                    if not s.text:
                        break
                    c = s.text[-1]
    return [m for m in mentions if m.text]


def _select_subset_of_overlapping_chain(chain: list[Mention]) -> list[Mention]:
    # greedy longest-first (recon/validation.py:39-65)
    sorted_chain = sorted(chain, key=lambda s: s.end - s.start, reverse=True)
    selected: list[Mention] = []
    for entity in sorted_chain:
        clash = False
        for kept in selected:
            if min(entity.end, kept.end) - max(entity.start, kept.start) > 0:
                clash = True
                break
        if not clash:
            selected.append(entity)
    return selected


def filter_overlaps(mentions: list[Mention]) -> list[Mention]:
    """Chain-greedy overlap resolution (recon/validation.py:67-112)."""
    spans = sorted(mentions, key=lambda s: s.start)
    kept: list[Mention] = []
    chain: list[Mention] = []
    chain_start = chain_end = 0
    for cur in spans:
        if not chain:
            chain = [cur]
            chain_start, chain_end = cur.start, cur.end
        elif min(cur.end, chain_end) - max(cur.start, chain_start) > 0:
            chain.append(cur)
            chain_start = min(cur.start, chain_start)
            chain_end = max(cur.end, chain_end)
        else:
            kept.extend(_select_subset_of_overlapping_chain(chain))
            chain = [cur]
            chain_start, chain_end = cur.start, cur.end
    kept.extend(_select_subset_of_overlapping_chain(chain))
    return sorted(kept, key=lambda s: s.start)


def fix_annotations(
    mentions: list[Mention],
    corrections: list[tuple[str, list[str], Optional[str]]] = spec.CORRECTIONS,
    case_sensitive: bool = False,
) -> list[Mention]:
    cmap = {}
    for annotation, from_labels, to_label in corrections:
        key = annotation if case_sensitive else annotation.lower()
        cmap[key] = (from_labels, to_label)
    out: list[Mention] = []
    for s in mentions:
        t = s.text if case_sensitive else s.text.lower()
        if t in cmap:
            from_labels, to_label = cmap[t]
            applies = s.label in from_labels or "ANY" in from_labels
            if applies and to_label is None:
                continue  # deleted
            if applies:
                s.label = to_label
        out.append(s)
    return out


def correct_mentions(mentions: list[Mention]) -> list[Mention]:
    """The frozen correction chain (see spec module docstring)."""
    mentions = upcase_labels(mentions)
    mentions = rename_labels(mentions, spec.RENAME_MAP)
    mentions = strip_annotations(mentions)
    mentions = filter_overlaps(mentions)
    mentions = fix_annotations(mentions)
    return mentions


# ---------------------------------------------------------------------------
# Linking → triples
# ---------------------------------------------------------------------------


def link_document(
    mentions: list[Mention],
    repo: str,
    path: str,
    lang: str,
    symdict: SymbolDict,
) -> list[dict]:
    """Emit raw (pre-canonicalization) triples for one document.

    Mentions must be sorted by start (correct_mentions guarantees it);
    the enclosing function of a CALL is the nearest preceding DEF span
    (generated corpora have no nested defs), else ``<module>``.
    """
    module = spec.module_of(path)
    file_id = f"{repo}/{path}"
    triples: list[dict] = []
    current_def: Optional[str] = None

    def emit(subj, pred, obj, subj_type, obj_type):
        triples.append(
            {
                "subj": subj,
                "pred": pred,
                "obj": obj,
                "subj_type": subj_type,
                "obj_type": obj_type,
            }
        )

    for m in sorted(mentions, key=lambda s: (s.start, s.end, s.label)):
        if m.label == "IMPORT":
            emit(repo, "imports", spec.import_root(m.text, lang), "repo", "package")
            emit(file_id, "imports_module", m.text, "file", "module")
        elif m.label == "DEF":
            name = spec.def_name(m.text)
            current_def = spec.qualified(repo, module, name)
            emit(file_id, "defines", current_def, "file", "function")
        elif m.label == "CALL":
            name = m.text
            subj = current_def or spec.qualified(repo, module, spec.MODULE_SENTINEL)
            resolved = symdict.resolve(repo, module, name)
            if resolved is not None:
                emit(subj, "calls", resolved, "function", "function")
            else:
                emit(subj, "calls_unresolved", name, "function", "ident")
        # IDENT mentions feed stats only
    return triples


# ---------------------------------------------------------------------------
# Whole-corpus extraction (sequential oracle)
# ---------------------------------------------------------------------------


def build_symbol_dict(rows: Iterable[dict]) -> SymbolDict:
    """Pass 1: DEF-only scan → repo-wide symbol dictionary."""
    sd = SymbolDict()
    for row in rows:
        module = spec.module_of(row["path"])
        # corrections may drop/alter DEF spans; run the real chain
        for m in correct_mentions(detect_mentions(row["content"], row["lang"])):
            if m.label == "DEF":
                sd.add(row["repo"], module, spec.def_name(m.text))
    return sd


def extract_corpus(rows: list[dict]) -> dict:
    """rows: dicts with repo/path/commit/lang/content.

    Returns {"mentions": [...], "triples": [...] (raw, with provenance),
    "canonical": [...] (deduped, sorted), "symbols": [...]}.
    """
    symdict = build_symbol_dict(rows)
    mention_rows: list[dict] = []
    triple_rows: list[dict] = []
    for row in rows:
        sha = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        mentions = correct_mentions(detect_mentions(row["content"], row["lang"]))
        for m in mentions:
            mention_rows.append(
                {
                    "repo": row["repo"],
                    "path": row["path"],
                    "text": m.text,
                    "start": m.start,
                    "end": m.end,
                    "label": m.label,
                }
            )
        for t in link_document(mentions, row["repo"], row["path"], row["lang"], symdict):
            t.update(
                repo=row["repo"],
                path=row["path"],
                commit=row["commit"],
                content_sha256=sha,
                extractor=spec.EXTRACTOR_TAG,
            )
            triple_rows.append(t)
    return {
        "mentions": mention_rows,
        "triples": triple_rows,
        "canonical": canonicalize(triple_rows),
        "symbols": symdict.to_rows(),
    }


def canonicalize(triples: list[dict]) -> list[dict]:
    """Exact dedup on (subj,pred,obj,subj_type,obj_type); count occurrences;
    provenance = the lexicographically smallest (repo,path) occurrence.
    Sorted by (subj,pred,obj) — the sort-based graph materialize order."""
    groups: dict[tuple, dict] = {}
    counts: dict[tuple, int] = defaultdict(int)
    for t in triples:
        key = (t["subj"], t["pred"], t["obj"], t["subj_type"], t["obj_type"])
        counts[key] += 1
        prev = groups.get(key)
        if prev is None or (t["repo"], t["path"]) < (prev["repo"], prev["path"]):
            groups[key] = t
    out = []
    for key in sorted(groups):
        t = groups[key]
        out.append(
            {
                "subj": key[0],
                "pred": key[1],
                "obj": key[2],
                "subj_type": key[3],
                "obj_type": key[4],
                "n_mentions": counts[key],
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "content_sha256": t["content_sha256"],
                "extractor": t["extractor"],
            }
        )
    return out
