"""Prodigy-format dataset connector WITHOUT Prodigy — the analogue of the
reference's ``to_prodigy`` / ``from_prodigy`` (recon/prodigy/utils.py:6-68),
which round-trip Example dicts through the Prodigy annotation database.
Prodigy itself is an annotation GUI (out of scope here, like the
reference's recipes/ server code); its *data contract* is public and
file-based: JSONL records ``{"text", "spans": [{"start","end","label"}],
"answer": "accept"|"reject"|"ignore", "_input_hash", "_task_hash"}``.

This module implements that contract over a dataset DIRECTORY (one JSONL
file per named dataset — the stand-in for the Prodigy DB):

- ``to_prodigy_jsonl``: writes a named dataset, refusing to overwrite an
  existing one unless ``overwrite_dataset=True`` (the reference's
  ValueError semantics); adds ``_input_hash`` (text identity) and
  ``_task_hash`` (text+spans identity) like Prodigy's ``set_hashes``
  (stable u64-derived int32 values — Prodigy's murmur-based values would
  differ numerically; the CONTRACT, input-vs-task identity, is preserved);
- ``from_prodigy_jsonl``: loads a named dataset back to a docs Dataset,
  raising ValueError listing available datasets when missing (mirrors
  recon/prodigy/utils.py:60-66); by default keeps only accepted answers
  (annotation-consumption behavior; ``answers=None`` keeps everything).
"""

from __future__ import annotations

import json
import os

from recon_ray.hashing import stable_u64


def _i32(u: int) -> int:
    """Prodigy hashes are signed 32-bit ints; fold our u64 likewise."""
    v = u & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _dataset_path(root: str, name: str) -> str:
    return os.path.join(root, f"{name}.jsonl")


def list_datasets(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        f[:-6] for f in os.listdir(root) if f.endswith(".jsonl")
    )


def to_prodigy_jsonl(
    docs_ds,
    root: str,
    dataset: str,
    overwrite_dataset: bool = False,
    add_hash: bool = True,
) -> int:
    """docs Dataset → Prodigy-format JSONL dataset. Returns n_records."""
    from recon_ray.ops.mentions_io import mentions_parts

    path = _dataset_path(root, dataset)
    if os.path.exists(path) and not overwrite_dataset:
        raise ValueError(f"Prodigy dataset {dataset} already exists.")
    os.makedirs(root, exist_ok=True)
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for batch in docs_ds.iter_batches(batch_format="pyarrow"):
            m_len, m_text, m_start, m_end, m_label, _src = mentions_parts(
                batch
            )
            texts = batch.column("text").to_pylist()
            pos = 0
            for i, text in enumerate(texts):
                spans = [
                    {
                        "text": m_text[j],
                        "start": int(m_start[j]),
                        "end": int(m_end[j]),
                        "label": m_label[j],
                    }
                    for j in range(pos, pos + int(m_len[i]))
                ]
                pos += int(m_len[i])
                rec = {"text": text, "spans": spans, "answer": "accept"}
                if add_hash:
                    rec["_input_hash"] = _i32(stable_u64(text))
                    rec["_task_hash"] = _i32(
                        stable_u64(
                            text,
                            *(
                                f"{s['start']}:{s['end']}:{s['label']}"
                                for s in spans
                            ),
                        )
                    )
                f.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
    os.replace(tmp, path)
    return n


def from_prodigy_jsonl(root: str, dataset: str, answers=("accept",)):
    """Prodigy-format JSONL dataset → docs Dataset. Missing datasets raise
    with the available names; ``answers`` filters records (None = all)."""
    from recon_ray.sources.jsonl import records_to_table

    import ray.data as rd

    path = _dataset_path(root, dataset)
    if not os.path.exists(path):
        raise ValueError(
            f"Prodigy dataset with name {dataset} does not exist. "
            f"Available datasets are: \n {', '.join(list_datasets(root))}"
        )
    records = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if answers is not None and rec.get("answer", "accept") not in answers:
                continue
            records.append(rec)
    return rd.from_arrow(records_to_table(records))
