"""X31 redaction half (pii_redact_stats / redact_pii): the scrub must
actually remove what the detection query found — probes rewrite to
exact known strings, the redacted corpus re-scans to zero matches,
and stage-wise replaced counts agree with pii_scan_stats' whole-text
detection counts on this corpus (no overlapping matches by
construction)."""

from __future__ import annotations

from data_mining_map_reduce_spark.queries import (
    _PII_PROBES,
    SPARK_QUERIES,
    redact_pii,
)

SF_SMOKE = "/root/testdata/sf0.001"

_EXPECTED_REDACTED = {
    -901: "reach me at <EMAIL> or <EMAIL> thanks",
    -902: "call <PHONE> or <PHONE> backup host <IP>",
    -903: "server <IP> peers <IP> and <IP> admin root@<IP>",
    -904: "ssn <SSN> alt <SSN> for records",
    -905: "card <CARD> or <CARD> bogus <CARD> done",
}


def test_probes_redact_to_known_strings(spark):
    df = spark.createDataFrame(
        [(doc_id, text, "_probe_pii") for doc_id, text in _PII_PROBES],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert {k: r.redacted for k, r in rows.items()} == _EXPECTED_REDACTED
    assert all(r.n_residual == 0 for r in rows.values())
    # per-stage replaced counts per probe (root@10.1.1.5 is an IP hit,
    # not an email — the email TLD requires letters). The card stage
    # scrubs every candidate, Luhn-valid or not (3 on probe -905).
    def counts(r):
        return (r.n_emails, r.n_phones, r.n_ssns, r.n_cards, r.n_ips)

    assert counts(rows[-901]) == (2, 0, 0, 0, 0)
    assert counts(rows[-902]) == (0, 2, 0, 0, 1)
    assert counts(rows[-903]) == (0, 0, 0, 0, 4)
    assert counts(rows[-904]) == (0, 0, 2, 0, 0)
    assert counts(rows[-905]) == (0, 0, 0, 3, 0)


def test_luhn_detection_rejects_invalid_candidates(spark):
    """Detection Luhn-checks card candidates: probe -905 carries two
    valid numbers (4539-1488-0343-6467 and 4111 1111 1111 1111) and
    one invalid (1234-5678-9012-3456) — the scan must report cards=2
    against card_candidates=3 for the probe source, and the SSN probe
    must not leak into the phone count (disjoint 3-2-4 vs 3-3-4
    shapes)."""
    probe = {
        r.source: r
        for r in SPARK_QUERIES["pii_scan_stats"](spark, SF_SMOKE).collect()
    }["_probe_pii"]
    assert probe.cards == 2
    assert probe.card_candidates == 3
    assert probe.ssns == 2
    assert probe.phones == 2  # only the -902 phones, not the SSNs
    assert probe.docs_with_pii == 5


def test_redaction_counts_match_detection(spark):
    """Replaced-count parity: on a corpus with no overlapping matches
    (this one, probes included), the number of substrings each
    redaction stage rewrites equals the detection query's whole-text
    match counts, and nothing survives the scrub."""
    detect = {
        r.source: r
        for r in SPARK_QUERIES["pii_scan_stats"](spark, SF_SMOKE).collect()
    }
    redact = {
        r.source: r
        for r in SPARK_QUERIES["pii_redact_stats"](spark, SF_SMOKE).collect()
    }
    assert set(detect) == set(redact)
    for source, d in detect.items():
        r = redact[source]
        assert (
            r.emails_redacted,
            r.phones_redacted,
            r.ssns_redacted,
            r.cards_redacted,
            r.ips_redacted,
        ) == (
            d.emails,
            d.phones,
            d.ssns,
            d.card_candidates,  # redaction scrubs candidates, not just Luhn-valid
            d.ips,
        ), source
        assert r.residual_matches == 0, source
        assert r.n_docs == d.n_docs, source


def test_stagewise_counts_are_replacements_not_detections(spark):
    """Documented semantics: counts are what each stage actually
    replaced, on that stage's INPUT. A phone-shaped digit run inside
    an email local part is scrubbed BY the email stage, so the phone
    stage counts 0 — while whole-text detection would also count 0
    here only because \\b never fires between word chars; the
    distinguishing case is a digit-leading local part, where the
    email redaction removes the phone match detection would see."""
    df = spark.createDataFrame(
        [(1, "123-456-7890@mail.example.com and host 1.2.3.4", "s")],
        "doc_id long, text string, source string",
    )
    row = redact_pii(df).collect()[0]
    # the email stage consumes the whole address, digits included
    assert row.redacted == "<EMAIL> and host <IP>"
    assert (row.n_emails, row.n_phones, row.n_ips) == (1, 0, 1)
    assert row.n_residual == 0
