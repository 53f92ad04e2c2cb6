"""Console span rendering — the ``Example.pretty_print`` analogue
(recon/types.py:161-188): walk the text left→right, splice each span's
text (highlighted) followed by its label, exactly the reference's
offset-walk semantics (overlapping spans degrade the same way: a span
starting before ``offset`` contributes its slice from the current
offset). ANSI codes are optional so output is pipe/test friendly."""

from __future__ import annotations

_ANSI_HIGHLIGHT = "\x1b[30;48;5;222m"
_ANSI_LABEL = "\x1b[30;48;5;141m"
_ANSI_RESET = "\x1b[0m"


def render_mentions(text: str, mentions, ansi: bool = False) -> str:
    """mentions: iterable of (start, end, label) [or objects with those
    attributes], assumed sorted by start like the reference's spans."""

    def mark(s: str, code: str) -> str:
        return f"{code} {s} {_ANSI_RESET}" if ansi else f"[{s}]"

    def label_mark(s: str) -> str:
        return f"{_ANSI_LABEL} {s} {_ANSI_RESET}" if ansi else f"({s})"

    parts = []
    offset = 0
    for m in mentions:
        start, end, label = (
            (m[0], m[1], m[2]) if isinstance(m, (tuple, list))
            else (m.start, m.end, m.label)
        )
        parts.append(text[offset:start])
        parts.append(mark(text[start:end], _ANSI_HIGHLIGHT))
        if label:
            parts.append(label_mark(label))
        offset = end
    parts.append(text[offset:])
    return "".join(parts)


def render_doc_row(row: dict, ansi: bool = False,
                   content_col: str = "content") -> str:
    """Render one docs-table row (nested ``mentions`` list column)."""
    ms = [
        (m["start"], m["end"], m["label"]) for m in (row.get("mentions") or [])
    ]
    return render_mentions(row[content_col], ms, ansi=ansi)
