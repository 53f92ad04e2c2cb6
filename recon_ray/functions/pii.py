"""PII detection and redaction over text columns.

The reference (kabirkhan/recon) has no PII module; the *shape* follows its
span-correction ops (recon/corrections.py:83-141 rename/strip — pure
per-example text rewrites, here re-expressed as zero-copy Arrow kernels).
PII scrubbing is a standard stage of a web-scale training-data pipeline
(see e.g. the C4 / Dolma cleanup recipes): find spans that look like
emails / phone numbers / government ids / card numbers / IPs and replace
them with a typed token before anything downstream sees the raw value.

Engine-parity note (what makes this SQL-oracle-able): pyarrow's
``replace_substring_regex`` / ``count_substring_regex`` and DuckDB's
``regexp_replace(..., 'g')`` / ``regexp_extract_all`` are both RE2, so the
exact same pattern string produces the exact same matches on both sides —
no lookarounds or backreferences are allowed in RE2, and none are used.

Scrub semantics: kinds apply SEQUENTIALLY in the order given — an earlier
kind's replacement token masks the text from later kinds (so ``ssn``
before ``number`` keeps ``123-45-6789`` from degrading into three
``<number>`` tokens). ``pii_counts`` counts each kind INDEPENDENTLY over
the original text (no masking), which is the right semantics for audit
dashboards.

Everything is a stateless ``map_batches`` stage over Arrow batches —
streaming, no shuffle, no driver collection; at 100 TB this runs at read
bandwidth.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PATTERNS", "DEFAULT_KINDS", "make_scrub_batch", "scrub",
           "make_counts_batch", "pii_counts"]

# RE2-safe patterns (no lookaround, no backrefs) — identical semantics in
# pyarrow.compute and DuckDB. Order in DEFAULT_KINDS is the scrub order:
# most-specific first so composite shapes win over bare digit runs.
PATTERNS: dict[str, str] = {
    # local@domain.tld (tld 2+ alpha); dots/plus tags in the local part
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+",
    # 16-digit card numbers grouped 4-4-4-4 by space/dash/nothing
    "card": r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b",
    # US SSN 3-2-4 with dashes
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # US-ish phone: optional +1 prefix, optional (area), separators -. or
    # space. The prefix group requires the literal 1 so a bare separator
    # (e.g. the space before the number) is never pulled into the match.
    "phone": r"(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
    # dotted-quad IPs (no range check — audit recall over precision)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # bare digit runs — aggressive; NOT in DEFAULT_KINDS
    "number": r"\d+",
}

DEFAULT_KINDS: tuple[str, ...] = ("email", "card", "ssn", "phone", "ipv4")


def _token(kind: str) -> str:
    return f"<{kind}>"


def make_scrub_batch(
    text_col: str = "text",
    kinds: Sequence[str] = DEFAULT_KINDS,
    out_col: Optional[str] = None,
):
    """Batch fn (pyarrow → pyarrow) replacing each kind's matches with its
    ``<kind>`` token, sequentially in ``kinds`` order. With ``out_col``
    the original column is kept and the scrubbed text lands beside it."""
    pats = [(k, PATTERNS[k]) for k in kinds]  # KeyError on unknown kind
    dst = out_col or text_col

    def scrub_batch(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        for kind, pat in pats:
            col = pc.replace_substring_regex(
                col, pattern=pat, replacement=_token(kind)
            )
        if dst in batch.column_names:
            return batch.set_column(
                batch.column_names.index(dst), dst, col
            )
        return batch.append_column(dst, col)

    return scrub_batch


def scrub(ds, text_col: str = "text", kinds: Sequence[str] = DEFAULT_KINDS,
          out_col: Optional[str] = None):
    """Streaming PII redaction: ``ds`` with ``text_col`` (or ``out_col``)
    scrubbed. Zero-copy Arrow in, no shuffle, no state."""
    return ds.map_batches(
        make_scrub_batch(text_col, kinds, out_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def make_counts_batch(text_col: str = "text",
                      kinds: Sequence[str] = DEFAULT_KINDS,
                      prefix: str = "n_"):
    """Batch fn adding one int64 ``{prefix}{kind}`` match-count column per
    kind, each counted independently over the ORIGINAL text."""
    pats = [(k, PATTERNS[k]) for k in kinds]

    def counts_batch(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        for kind, pat in pats:
            n = pc.cast(pc.count_substring_regex(col, pattern=pat),
                        pa.int64())
            batch = batch.append_column(f"{prefix}{kind}", n)
        return batch

    return counts_batch


def pii_counts(ds, text_col: str = "text",
               kinds: Sequence[str] = DEFAULT_KINDS, prefix: str = "n_"):
    """Per-row PII audit counts (independent per kind, unmasked)."""
    return ds.map_batches(
        make_counts_batch(text_col, kinds, prefix),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def pseudonymize_column(ds, col: str, salt: int,
                        token_col: str = None):
    """Consistent keyed token replacement for an integer identifier
    column (GDPR-style pseudonymization: same id + same salt → same
    token everywhere, so joins/sessionization still work after the
    swap; rotate the salt to unlink datasets). token = (id + salt)·C
    mod 2⁶⁴ with C the odd golden-ratio multiplier — a bijection, so
    distinct ids never collide, and exactly SQL-replicable in HUGEINT.

    NOT cryptographic anonymization: with the constant public the map
    is invertible; a hostile-reader deployment swaps in a keyed PRF
    (SipHash/HMAC) behind this same column contract — the distributed
    shape (stateless zero-copy map, no shuffle) is unchanged."""
    import numpy as np
    import pyarrow as pa

    token_col = token_col or f"{col}_token"

    def tok(t: "pa.Table") -> "pa.Table":
        ids = t.column(col).to_numpy().astype(np.uint64)
        h = (ids + np.uint64(salt)) * np.uint64(_PSEUDO_C)  # wraps mod 2^64
        return t.append_column(token_col, pa.array(h, pa.uint64()))

    return ds.map_batches(tok, batch_format="pyarrow",
                          zero_copy_batch=True)


_PSEUDO_C = 0x9E3779B97F4A7C15  # odd ⇒ bijection mod 2^64
