"""PII scrub kernel: redaction, counting, order of application."""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.functions.scrub import scrub_pii, scrub_pii_batch


def test_scrub_all_three_kinds():
    col = pa.array(
        [
            "mail me at jo.doe+x@firm.co.uk today",
            "server 192.168.1.255 rebooted",
            "call +45 11 22 33 44 now",
            "clean text, nothing here",
        ]
    )
    out, n = scrub_pii(col)
    assert out.to_pylist() == [
        "mail me at <EMAIL> today",
        "server <IP> rebooted",
        "call <PHONE> now",
        "clean text, nothing here",
    ]
    assert n.to_pylist() == [1, 1, 1, 0]


def test_scrub_email_wins_over_ip_and_counts_are_per_input():
    # the address host contains a dotted quad: email pattern is
    # applied first, so the IP rule never sees it post-replacement;
    # counts are computed per-pattern on the INPUT text (both facts
    # mirrored by the SQL twin)
    col = pa.array(["ping a@b1.2.3.4.dk and 5.6.7.8"])
    out, n = scrub_pii(col)
    assert out.to_pylist() == ["ping <EMAIL> and <IP>"]
    assert n.to_pylist() == [2]


def test_scrub_batch_shape():
    t = pa.table({"doc_id": [1], "text": ["x y@z.dk"]})
    out = scrub_pii_batch(t)
    assert out.column_names == ["doc_id", "text", "text_clean", "n_pii"]
    assert out.column("text_clean").to_pylist() == ["x <EMAIL>"]


def test_url_canonicalization_rules():
    import pyarrow as pa

    from knowledge_graph_ray.functions.urltools import canonical_url

    host, canon = canonical_url(
        pa.array(
            [
                "HTTP://WWW.Site.COM:80/A/B/?x=1#f",  # fold host, strip all
                "https://site.com:443/CaseKept",  # only :80 strips (conservative)
                "http://site.com",  # no path at all
                "http://www.site.com:8080///",  # non-default port kept
            ]
        )
    )
    assert host.to_pylist() == ["site.com", "site.com:443", "site.com", "site.com:8080"]
    assert canon.to_pylist() == [
        "site.com/A/B",
        "site.com:443/CaseKept",
        "site.com",
        "site.com:8080",
    ]
