"""spaCy DocBin (``.spacy``) codec WITHOUT spaCy — the analogue of the
reference's ``from_spacy`` / ``to_spacy`` loaders (recon/loaders.py:58-130),
which this container can't run because spaCy isn't installed. Instead of
stubbing, this reimplements the *file format* from spaCy's public source:

- container (spacy/tokens/_serialize.py ``DocBin.to_bytes``):
  ``zlib(msgpack({version, attrs, tokens, spaces, lengths, strings, cats,
  flags, span_groups}))`` — tokens is a C-order uint64 array of shape
  (total_tokens, len(attrs)), spaces a bool column, lengths int32 per doc;
- attr IDs (spacy/symbols.pxd public enum): ORTH=65, ENT_IOB=77,
  ENT_TYPE=78 — the exact set the reference's ``to_spacy`` exports
  (``DocBin(attrs=["ENT_IOB", "ENT_TYPE"])`` → [ORTH, ENT_IOB, ENT_TYPE]);
- string attr values are StringStore hashes: MurmurHash3 x64-128, seed 1,
  low 64 bits of the UTF-8 bytes (spacy/strings.pyx ``hash_string``),
  reimplemented below in pure Python;
- ENT_IOB int coding: 0 unset, 1 I, 2 O, 3 B (spacy/tokens/token.pyx).

Reading resolves hashes through the FILE'S OWN strings table, so
round-trips are exact regardless of the hash function; writing emits
murmur hashes so a real spaCy ``DocBin().from_disk`` can resolve them.
Caveats (documented, not load-bearing for round-trip): the murmur
implementation can't be compared against spaCy in this container, and
labels that collide with spaCy's built-in symbol names would map through
symbol IDs in a real vocab, not hashes.

Like the reference's loader this is an annotation-interchange codec, not
a corpus-scale source: one DocBin holds one exported annotation batch and
is built/parsed in a single task (the distributed path is JSONL/Parquet).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_M64 = (1 << 64) - 1

# spacy/symbols.pxd
ORTH = 65
ENT_IOB = 77
ENT_TYPE = 78

_IOB_I, _IOB_O, _IOB_B = 1, 2, 3


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128_low(data: bytes, seed: int = 1) -> int:
    """MurmurHash3 x64-128 (Appleby's reference algorithm), returning the
    low 64 bits (h1) — spaCy's ``hash_string`` with its seed=1."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o:o + 8], "little")
        k2 = int.from_bytes(data[o + 8:o + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = (_rotl(k1, 31) * c2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = (_rotl(k2, 33) * c1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _M64
        k2 = (_rotl(k2, 33) * c1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _M64
        k1 = (_rotl(k1, 31) * c2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    return h1


def hash_string(s: str) -> int:
    """spaCy StringStore id: 0 for "", murmur3 low-64 (seed 1) otherwise."""
    if not s:
        return 0
    return murmur3_x64_128_low(s.encode("utf-8"), seed=1)


def _emit_gap(gap: str, out_words: list, out_spaces: list) -> None:
    """Represent an inter-token gap: a single space folds into the
    previous token's space bool; anything else becomes a whitespace
    pseudo-token (with a leading space folded back and a trailing space
    carried as its own bool)."""
    if gap == " " and out_words:
        out_spaces[-1] = True
        return
    if out_words and gap[0] == " ":
        out_spaces[-1] = True
        gap = gap[1:]
    if gap:
        trail = gap.endswith(" ")
        out_words.append(gap[:-1] if trail else gap)
        out_spaces.append(trail)


def _words_and_spaces(text: str, starts, ends, words):
    """spacy.util.get_words_and_spaces semantics: align tokens to the raw
    text, inserting whitespace pseudo-tokens for inter-token gaps that are
    not exactly one space (DocBin can only store a single trailing-space
    bool per token)."""
    out_words, out_spaces = [], []
    pos = 0
    for s, e, w in zip(starts, ends, words):
        if s > pos:
            _emit_gap(text[pos:s], out_words, out_spaces)
        out_words.append(w)
        out_spaces.append(False)
        pos = e
    if pos < len(text):
        _emit_gap(text[pos:], out_words, out_spaces)
    return out_words, out_spaces


def write_docbin(docs_ds, path: str) -> int:
    """docs Dataset (doc_id, text, mentions) → one ``.spacy`` DocBin file
    with [ORTH, ENT_IOB, ENT_TYPE] per token (the reference's to_spacy
    export shape, recon/loaders.py:96-130). Tokenization is the repo's
    deterministic regex tokenizer (ops/tokens.py). Returns n_docs."""
    import msgpack

    from recon_ray.ops.mentions_io import mentions_parts
    from recon_ray.ops.tokens import tokenize

    attrs = [ORTH, ENT_IOB, ENT_TYPE]
    tok_rows, space_rows, lengths, strings = [], [], [], set()
    n_docs = 0
    for batch in docs_ds.iter_batches(batch_format="pyarrow"):
        m_len, m_text, m_start, m_end, m_label, _src = mentions_parts(batch)
        texts = batch.column("text").to_pylist()
        pos = 0
        for i, text in enumerate(texts):
            spans = [
                (int(m_start[j]), int(m_end[j]), m_label[j])
                for j in range(pos, pos + int(m_len[i]))
            ]
            pos += int(m_len[i])
            words, starts, ends = tokenize(text)
            words, spaces = _words_and_spaces(text, starts, ends, words)
            # recompute offsets over the padded word list
            offs = []
            p = 0
            for w, sp in zip(words, spaces):
                offs.append((p, p + len(w)))
                p += len(w) + (1 if sp else 0)
            iob = np.full(len(words), _IOB_O, np.uint64)
            etype = np.zeros(len(words), np.uint64)
            for s, e, label in spans:
                lab_h = hash_string(label)
                strings.add(label)
                first = True
                for t_i, (ts, te) in enumerate(offs):
                    if ts >= e:
                        break
                    if te > s:
                        iob[t_i] = _IOB_B if first else _IOB_I
                        etype[t_i] = lab_h
                        first = False
            orth = np.fromiter(
                (hash_string(w) for w in words), np.uint64, count=len(words)
            )
            strings.update(words)
            tok_rows.append(np.column_stack([orth, iob, etype]))
            space_rows.append(np.asarray(spaces, bool).reshape(-1, 1))
            lengths.append(len(words))
            n_docs += 1
    tokens = (
        np.vstack(tok_rows) if tok_rows else np.empty((0, len(attrs)), np.uint64)
    )
    spaces = np.vstack(space_rows) if space_rows else np.empty((0, 1), bool)
    msg = {
        "version": "0.1.0",
        "attrs": attrs,
        "tokens": tokens.astype(np.uint64).tobytes("C"),
        "spaces": spaces.tobytes("C"),
        "lengths": np.asarray(lengths, dtype="int32").tobytes("C"),
        "strings": sorted(strings),
        "cats": [{} for _ in range(n_docs)],
        "flags": [{"has_unknown_spaces": False} for _ in range(n_docs)],
        "span_groups": [b"" for _ in range(n_docs)],
    }
    with open(path, "wb") as f:
        f.write(zlib.compress(msgpack.packb(msg, use_bin_type=True)))
    return n_docs


def read_docbin(path: str):
    """One ``.spacy`` DocBin file → docs Dataset (doc_id, text, meta_json,
    mentions) — the reference's from_spacy decode (recon/loaders.py:58-93):
    text from words+spaces, entity spans from B/I runs. Hashes resolve
    through the file's own strings table."""
    import msgpack
    import ray.data as rd

    from recon_ray.sources.jsonl import records_to_table

    with open(path, "rb") as f:
        msg = msgpack.unpackb(zlib.decompress(f.read()), raw=False)
    attrs = list(msg["attrs"])
    lengths = np.frombuffer(msg["lengths"], dtype="int32")
    n_attrs = len(attrs)
    tokens = np.frombuffer(msg["tokens"], dtype=np.uint64)
    tokens = (
        tokens.reshape(-1, n_attrs) if n_attrs else tokens.reshape(-1, 0)
    )
    spaces = np.frombuffer(msg["spaces"], dtype=bool).reshape(-1)
    by_hash = {hash_string(s): s for s in msg.get("strings", [])}
    i_orth = attrs.index(ORTH)
    i_iob = attrs.index(ENT_IOB) if ENT_IOB in attrs else None
    i_ent = attrs.index(ENT_TYPE) if ENT_TYPE in attrs else None

    records = []
    row = 0
    for n in lengths:
        n = int(n)
        t = tokens[row:row + n]
        sp = spaces[row:row + n]
        row += n
        words = [by_hash.get(int(h), "") for h in t[:, i_orth]]
        starts = np.zeros(n, np.int64)
        pos = 0
        parts = []
        for k in range(n):
            starts[k] = pos
            parts.append(words[k])
            pos += len(words[k])
            if sp[k]:
                parts.append(" ")
                pos += 1
        text = "".join(parts)
        spans = []
        if i_iob is not None and i_ent is not None:
            k = 0
            while k < n:
                iob = int(t[k, i_iob])
                if iob in (_IOB_B, _IOB_I):
                    j = k + 1
                    while j < n and int(t[j, i_iob]) == _IOB_I:
                        j += 1
                    s_char = int(starts[k])
                    e_char = int(starts[j - 1]) + len(words[j - 1])
                    label = by_hash.get(int(t[k, i_ent]), "")
                    spans.append(
                        {"start": s_char, "end": e_char, "label": label}
                    )
                    k = j
                else:
                    k += 1
        records.append({"text": text, "spans": spans})
    return rd.from_arrow(records_to_table(records))
