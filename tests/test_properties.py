"""Property-based tests (Hypothesis): operators vs brute-force
reference implementations on randomized small inputs.

The oracle suite checks fixed corpora; these check the SEMANTICS on
adversarially-shrunk random inputs — empty groups, ties, duplicate
timestamps, singleton sets — where hand-written fixtures have blind
spots. Example counts are kept small because every example is a real
Spark round-trip.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_left_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 15),  # ts
        st.integers(0, 99),  # lv payload
    ),
    min_size=0,
    max_size=12,
)
_right_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 15),  # rts
        st.integers(0, 99),  # rv payload
    ),
    min_size=0,
    max_size=12,
)


def _brute_asof(lrows, rrows, inclusive):
    out = []
    for k, ts, lv in lrows:
        cands = [
            (rts, rv)
            for rk, rts, rv in rrows
            if rk == k and (rts <= ts if inclusive else rts < ts)
        ]
        # operator contract: greatest rts wins; ties among identical
        # (key, rts) right rows break by greatest payload tuple
        out.append((k, ts, lv, max(cands) if cands else (None, None)))
    return sorted(
        (k, ts, lv, m[0], m[1]) for k, ts, lv, m in out
    )


@settings(**_SETTINGS)
@given(lrows=_left_rows, rrows=_right_rows, inclusive=st.booleans())
def test_asof_join_matches_brute_force(spark, lrows, rrows, inclusive):
    from data_mining_map_reduce_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(k, ts, lv, i) for i, (k, ts, lv) in enumerate(lrows)],
        "k int, ts int, lv int, rowid int",
    )
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "k int, rts int, rv int"
    )
    if not rrows:
        right = right.where("k IS NOT NULL")
    got = sorted(
        (r.k, r.ts, r.lv, r.rts, r.rv)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            inclusive=inclusive,
        ).collect()
    )
    assert got == _brute_asof(lrows, rrows, inclusive)


_collections = st.dictionaries(
    keys=st.integers(0, 5),
    values=st.sets(st.integers(0, 7), min_size=1, max_size=6),
    min_size=0,
    max_size=6,
)


def _brute_jaccard(colls, t):
    keys = sorted(colls)
    out = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(colls[a] & colls[b])
            union = len(colls[a] | colls[b])
            if union and inter / union >= t:
                out.add((a, b, round(inter / union, 6)))
    return out


@settings(**_SETTINGS)
@given(
    colls=_collections,
    t=st.sampled_from([0.25, 0.5, 0.75, 1.0]),
    prefix=st.booleans(),
)
def test_exact_jaccard_pairs_matches_brute_force(spark, colls, t, prefix):
    """Both physical plans (count-join and prefix-filtered) must equal
    brute force on every random collection family — the two-plans-one-
    contract claim, fuzzed."""
    from data_mining_map_reduce_spark.operators.similarity import (
        exact_jaccard_pairs,
    )

    rows = [(k, str(i)) for k, items in colls.items() for i in items]
    df = spark.createDataFrame(rows or [(None, None)], "k int, item string")
    if not rows:
        df = df.where("k IS NOT NULL")
    got = {
        (r.a, r.b, r.jaccard)
        for r in exact_jaccard_pairs(
            df, "k", "item", threshold=t, prefix_filter=prefix
        ).collect()
    }
    assert got == _brute_jaccard(colls, t)


def test_md5_hash60_matches_duckdb(spark):
    """The cross-engine hash seam every sketch/LSH oracle stands on:
    Spark's md5_hash60 must equal DuckDB's
    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) byte-for-byte —
    including multi-byte UTF-8, separators, and numeric string forms."""
    import duckdb
    from pyspark.sql import functions as F

    from data_mining_map_reduce_spark.functions.hashing import md5_hash60

    samples = [
        "", "a", "hello world", "0", "-17", "3|42", "tok1 tok2 tok3",
        "Ünïcodé ✓ 漢字", "|||", " leading and trailing ", "1e10",
    ] + [f"key{i}|7" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", md5_hash60("s").alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert got[s] == want, s


# ---------------------------------------------------------------------------
# X31 redaction (r12): randomized planted-PII corpora. The oracle row
# checks one fixed corpus; this checks the scrub CONTRACT on random
# documents — exact replaced counts per stage, zero residual, and
# non-PII text untouched — including adversarial shapes like PII at
# document start/end and adjacent plants.
# ---------------------------------------------------------------------------

_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
_email = st.builds(
    lambda a, b: f"{a}@{b}.com",
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8),
)
_phone = st.builds(
    lambda a, b, c: f"{a:03d}-{b:03d}-{c:04d}",
    st.integers(0, 999), st.integers(0, 999), st.integers(0, 9999),
)
_ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *([st.integers(0, 255)] * 4),
)
_tokens = st.lists(
    st.one_of(
        st.tuples(st.just("w"), _word),
        st.tuples(st.just("e"), _email),
        st.tuples(st.just("p"), _phone),
        st.tuples(st.just("i"), _ip),
    ),
    min_size=0,
    max_size=12,
)


@settings(**_SETTINGS)
@given(docs=st.lists(_tokens, min_size=1, max_size=4))
def test_redact_pii_matches_planted_counts(spark, docs):
    from data_mining_map_reduce_spark.queries import redact_pii

    rows = [
        (i, " ".join(tok for _, tok in doc), "s")
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    for i, doc in enumerate(docs):
        kinds = [k for k, _ in doc]
        r = got[i]
        assert (r.n_emails, r.n_phones, r.n_ips) == (
            kinds.count("e"),
            kinds.count("p"),
            kinds.count("i"),
        ), (doc, r)
        assert r.n_residual == 0, (doc, r.redacted)
        want = " ".join(
            {"w": tok, "e": "<EMAIL>", "p": "<PHONE>", "i": "<IP>"}[k]
            if k != "w"
            else tok
            for k, tok in doc
        )
        assert r.redacted == want, (doc, r.redacted)


@settings(**_SETTINGS)
@given(
    colls=_collections,
    tau=st.sampled_from([1, 2, 3]),
    cap=st.sampled_from([None, 2, 5000]),
)
def test_cooccurrence_lsh_refines_exact_fuzzed(spark, colls, tau, cap):
    """The pre-cut's refinement contract, fuzzed (the X18 precedent):
    on every random collection family and every hot-bucket cap, the
    LSH build's output must be a SUBSET of the exact overlap counts
    with identical n_shared on every emitted pair — precision 1.0 is
    the invariant; recall is the banding's business (and with cap=2
    deliberately brutal bucket-dropping, possibly tiny)."""
    from data_mining_map_reduce_spark.operators.relational import (
        co_occurrence_pairs_lsh,
    )

    rows = [(k, str(i)) for k, items in colls.items() for i in items]
    df = spark.createDataFrame(rows or [(None, None)], "k int, item string")
    if not rows:
        df = df.where("k IS NOT NULL")
    exact = {}
    keys = sorted(colls)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            n = len(colls[a] & colls[b])
            if n >= tau:
                exact[(a, b)] = n
    got = {
        (r.a, r.b): r.n_shared
        for r in co_occurrence_pairs_lsh(
            df, "k", "item", min_shared=tau, max_bucket=cap
        ).collect()
    }
    assert set(got) <= set(exact)
    assert all(exact[p] == n for p, n in got.items())
