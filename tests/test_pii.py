"""PII scrub/count kernels — hand-pinned expected redactions, sequential
masking order, and RE2 engine parity with DuckDB (the driver oracle runs
``regexp_replace(..., 'g')`` over the same patterns)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from recon_ray.functions.pii import (
    DEFAULT_KINDS,
    PATTERNS,
    pii_counts,
    scrub,
)

CRAFTED = [
    "contact jane.doe+spam@mail-host.co.uk or bob@x.io today",
    "card 4111-1111 1111 1111 exp 12/29, ssn 123-45-6789",
    "call +1 (415) 555-0134 or 415.555.0199 now",
    "host 10.0.255.3 proxied 192.168.0.1; build 4521",
    "no pii here at all",
    "",
    "edge@case.museum trailing 999-99-9999",
]


@pytest.fixture(scope="module")
def ds():
    return rd.from_pandas(
        pd.DataFrame({"id": range(len(CRAFTED)), "text": CRAFTED})
    ).repartition(3)


def test_scrub_pinned(ds):
    got = (
        scrub(ds, "text").to_pandas().sort_values("id")["text"].tolist()
    )
    assert got == [
        "contact <email> or <email> today",
        "card <card> exp 12/29, ssn <ssn>",
        "call <phone> or <phone> now",
        "host <ipv4> proxied <ipv4>; build 4521",
        "no pii here at all",
        "",
        "<email> trailing <ssn>",
    ]


def test_scrub_sequential_masking(ds):
    """ssn is consumed by the ssn token, not shredded into <number>s; a
    reversed order would shred it — the order IS the semantics."""
    got = (
        scrub(ds, "text", kinds=("ssn", "number"))
        .to_pandas().sort_values("id")["text"].tolist()
    )
    assert got[1] == (
        "card <number>-<number> <number> <number> exp <number>/<number>,"
        " ssn <ssn>"
    )
    shredded = (
        scrub(ds, "text", kinds=("number",))
        .to_pandas().sort_values("id")["text"].tolist()
    )
    assert "<ssn>" not in shredded[1]


def test_scrub_out_col_keeps_original(ds):
    out = scrub(ds, "text", out_col="redacted").to_pandas().sort_values("id")
    assert out["text"].tolist() == CRAFTED
    assert out["redacted"].iloc[0] == "contact <email> or <email> today"


def test_counts_independent(ds):
    out = (
        pii_counts(ds, "text", kinds=("ssn", "number"))
        .to_pandas().sort_values("id")
    )
    # counts are over the ORIGINAL text: the ssn's digit runs still count
    assert out["n_ssn"].tolist() == [0, 1, 0, 0, 0, 0, 1]
    assert out["n_number"].iloc[1] == 4 + 2 + 3  # card + exp + ssn runs
    assert out["n_number"].iloc[4] == 0


def test_duckdb_engine_parity(ds):
    """Every pattern, replace AND count, must agree with DuckDB's RE2 on
    the crafted corpus — this is what licenses the SQL oracles."""
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(CRAFTED)),
                                    "text": CRAFTED}))
    for kind in (*DEFAULT_KINDS, "number"):
        pat = PATTERNS[kind]
        want_r = con.execute(
            "SELECT regexp_replace(text, ?, ?, 'g') FROM t ORDER BY id",
            [pat, f"<{kind}>"],
        ).df().iloc[:, 0].tolist()
        got_r = (
            scrub(ds, "text", kinds=(kind,))
            .to_pandas().sort_values("id")["text"].tolist()
        )
        assert got_r == want_r, kind
        want_c = con.execute(
            "SELECT len(regexp_extract_all(text, ?)) FROM t ORDER BY id",
            [pat],
        ).df().iloc[:, 0].tolist()
        got_c = (
            pii_counts(ds, "text", kinds=(kind,))
            .to_pandas().sort_values("id")[f"n_{kind}"].tolist()
        )
        assert got_c == want_c, kind
