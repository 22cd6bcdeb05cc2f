"""Pin the fixture invariants the multimodal/text oracles rely on.

Several DuckDB oracles replay byte-level codecs through CHARACTER
functions (``ascii(substr(text, i, 1))``, varchar ``substring`` as a
byte slice — q_multimodal_decode, q_frame_sample, q_feature_hist,
q_feature_extract).  That replay is exact only while ``documents.text``
is non-empty pure ASCII (one byte per character, codepoint == byte).
A future fixture with an empty or non-ASCII document would make those
oracles silently diverge (the decode oracle's per-character sums drop
or shift) — this test turns that silent red into a loud fixture-
contract failure naming the broken invariant.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_documents_text_nonempty_pure_ascii(sf_dir):
    bad = duckdb.sql(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NULL
           OR length(text) = 0
           OR octet_length(encode(text)) <> length(text)
        """
    ).fetchone()[0]
    assert bad == 0, (
        f"{sf_dir}/documents.parquet violates the non-empty pure-ASCII "
        "text invariant the multimodal byte-codec oracles replay against"
    )
