"""Extraction SPEC shared by the single-process reference extractor and the
Ray Data pipeline.

This module defines WHAT is extracted (patterns, labels, corrections,
linking/resolution rules) — pure data + tiny pure functions. The two
execution engines (recon_ray/reference_extractor.py — sequential, in the
style of the reference's per-Example loops, recon/operations.py:236-258;
and recon_ray/pipelines/kg.py — distributed Ray Data) implement the HOW
independently and must agree triple-for-triple (the P/R≥0.95 gate in
BASELINE.json; our tests assert exact equality).

Label lifecycle (mirrors the reference's messy-label fixtures, e.g. the
``skill``/``SKILL`` mixed-case corpus of tests/test_stats.py:26-27):
detectors emit RAW lowercase labels (``import``, ``import_from``, ``def``,
``call``, ``ident``); the correction chain then applies
``upcase_labels → rename_labels(RENAME_MAP) → strip_annotations →
filter_overlaps → fix_annotations(CORRECTIONS)`` to produce the clean
``IMPORT | DEF | CALL | IDENT`` label set. The correction chain is
load-bearing: skipping it changes the emitted triples.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

# ---------------------------------------------------------------------------
# Span model (the reference's Span, recon/types.py:41-58, minus spaCy fields)
# ---------------------------------------------------------------------------


@dataclass
class Mention:
    """A candidate span over file content (char offsets, like recon Span)."""

    text: str
    start: int
    end: int
    label: str
    source: str = ""  # detector pattern that produced it

    def key(self) -> tuple:
        # analogue of span_hash inputs (recon/hashing.py:22-39)
        return (self.start, self.end, self.label, self.text)


# ---------------------------------------------------------------------------
# Detector patterns, per language. RAW labels are lowercase on purpose.
# ---------------------------------------------------------------------------

_ID = r"[A-Za-z_][A-Za-z0-9_]*"

#: Each entry: (raw_label, compiled regex, span group index).
#: The span covers the regex group; offsets are into the whole file content.
#: CALL spans deliberately include trailing whitespace before the "(" —
#: strip_annotations later trims it (mirrors the reference's dirty-boundary
#: fixtures, tests/test_corrections.py:56-78).
#: DEF spans cover the keyword + name ("def foo") so that filter_overlaps'
#: longest-wins rule (recon/validation.py:39-112) beats the CALL span the
#: call pattern also produces at a def site.
PATTERNS: dict[str, list[tuple[str, re.Pattern, int]]] = {
    "python": [
        ("import", re.compile(rf"^[ \t]*import[ \t]+({_ID}(?:\.{_ID})*)", re.M), 1),
        (
            "import_from",
            re.compile(rf"^[ \t]*from[ \t]+({_ID}(?:\.{_ID})*)[ \t]+import\b", re.M),
            1,
        ),
        ("def", re.compile(rf"^[ \t]*(def[ \t]+{_ID})[ \t]*\(", re.M), 1),
        ("call", re.compile(rf"\b({_ID}[ \t]*)\("), 1),
        ("ident", re.compile(rf"^[ \t]*({_ID})[ \t]*=[^=]", re.M), 1),
    ],
    "javascript": [
        ("import", re.compile(r"require\(\s*['\"]([^'\"]+)['\"]\s*\)"), 1),
        (
            "import_from",
            re.compile(r"^\s*import\s+[^'\"\n]+\s+from\s+['\"]([^'\"]+)['\"]", re.M),
            1,
        ),
        ("def", re.compile(rf"\b(function[ \t]+{_ID})[ \t]*\("), 1),
        ("call", re.compile(rf"\b({_ID}[ \t]*)\("), 1),
        ("ident", re.compile(rf"^\s*(?:const|let|var)\s+({_ID})\s*=[^=]", re.M), 1),
    ],
    "go": [
        ("import", re.compile(r"^[ \t]*import[ \t]+\"([^\"]+)\"", re.M), 1),
        ("def", re.compile(rf"\b(func[ \t]+{_ID})[ \t]*\(", re.M), 1),
        ("call", re.compile(rf"\b({_ID}[ \t]*)\("), 1),
        ("ident", re.compile(rf"^[ \t]*({_ID})[ \t]*:=", re.M), 1),
    ],
}

#: rename map applied AFTER upcase (rename_labels semantics,
#: recon/corrections.py:12-25): from-import collapses into IMPORT.
RENAME_MAP: dict[str, str] = {"IMPORT_FROM": "IMPORT"}

#: strip_annotations char set — exactly the reference default
#: (recon/corrections.py:142-176).
STRIP_CHARS: list[str] = [".", "!", "?", "-", ":", " "]

#: Keyword false-positives of the call pattern, deleted via fix_annotations
#: (to_label=None deletes, recon/corrections.py:62-74). Case-insensitive
#: (the reference lowercases correction keys by default).
CALL_KEYWORDS: list[str] = [
    # python
    "if", "elif", "while", "for", "return", "with", "assert", "not", "in",
    "and", "or", "yield", "lambda", "print",
    # javascript
    "switch", "catch", "function",
    # go
    "func", "range", "go", "defer", "select",
]

#: fix_annotations corrections: (annotation_text, from_labels, to_label).
#: to_label None ⇒ delete the mention (recon/types.py:452-503 Correction).
CORRECTIONS: list[tuple[str, list[str], Optional[str]]] = [
    (kw, ["CALL"], None) for kw in CALL_KEYWORDS
]

#: Final clean label set.
LABELS = ("IMPORT", "DEF", "CALL", "IDENT")


# ---------------------------------------------------------------------------
# Linking / resolution rules (pure functions; shared by both engines)
# ---------------------------------------------------------------------------


def module_of(path: str) -> str:
    """posix path → dotted module id: 'src/pkg/mod.py' → 'src.pkg.mod'."""
    stem = path.rsplit(".", 1)[0]
    return stem.replace("/", ".")


def qualified(repo: str, module: str, name: str) -> str:
    return f"{repo}:{module}.{name}"


def def_name(span_text: str) -> str:
    """DEF span text 'def foo' / 'function foo' / 'func foo' → 'foo'."""
    return span_text.split()[-1]


def import_root(module_path: str, lang: str) -> str:
    """Imported module string → canonical package object.

    python: first dotted component ('collections.abc' → 'collections');
    javascript: first path segment of a bare specifier ('lodash/fp' →
    'lodash'); relative specifiers keep their full text; go: full import
    path (idiomatic: the path IS the package identity).
    """
    if lang == "python":
        return module_path.split(".", 1)[0]
    if lang == "javascript":
        if module_path.startswith("."):
            return module_path
        return module_path.split("/", 1)[0]
    return module_path


@dataclass
class SymbolDict:
    """repo → function name → sorted list of qualified definition ids.

    The entity-linker dictionary (analogue of the KB in recon/linker.py:27-36
    and the Entity rows of recon/types.py:205-208). Resolution: same-module
    definition wins; else the lexicographically smallest qualified id in the
    repo (deterministic ambiguity rule); else unresolved.
    """

    by_repo: dict = field(default_factory=dict)

    def add(self, repo: str, module: str, name: str) -> None:
        repo_map = self.by_repo.setdefault(repo, {})
        lst = repo_map.setdefault(name, [])
        q = qualified(repo, module, name)
        if q not in lst:
            lst.append(q)
            lst.sort()

    def resolve(self, repo: str, module: str, name: str) -> Optional[str]:
        lst = self.by_repo.get(repo, {}).get(name)
        if not lst:
            return None
        same = qualified(repo, module, name)
        if same in lst:
            return same
        return lst[0]

    def to_rows(self) -> list[dict]:
        rows = []
        for repo in sorted(self.by_repo):
            for name in sorted(self.by_repo[repo]):
                for q in self.by_repo[repo][name]:
                    rows.append({"id": q, "name": name, "repo": repo})
        return rows


MODULE_SENTINEL = "<module>"
EXTRACTOR_TAG = "recon_ray.spec.v1"
