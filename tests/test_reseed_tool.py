"""tools/reseed_sweep.py generation guard: regenerated tables keep the
schemas, row counts, and the planted near-dup structure the catalog
gates measure against — so the sweep keeps simulating the driver's
generator faithfully as the repo evolves."""

from __future__ import annotations

import itertools
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="testdata not present",
)


def test_reseed_dir_is_faithful(tmp_path):
    from reseed_sweep import REGENERATED, TABLES, build_reseed_dir

    out = build_reseed_dir(SF_DIR, str(tmp_path / "rs"), seed=4242)
    for name in TABLES:
        src = f"{SF_DIR}/{name}.parquet"
        if not os.path.exists(src):
            continue
        a, b = pq.read_table(src), pq.read_table(f"{out}/{name}.parquet")
        assert a.num_rows == b.num_rows, name
        assert a.schema.names == b.schema.names, name
        if name not in REGENERATED:
            assert a.equals(b), f"{name} should be copied through"

    docs = pq.read_table(f"{out}/documents.parquet")
    texts = docs.column("text").to_pylist()
    assert len(set(texts)) == len(texts)  # exact-dup-free like the original

    # the planted copy-chain structure the dedup gates need: ≥2% of
    # rows participate in a ~0.99-Jaccard pair
    def sh3(t):
        w = t.split()
        return set(tuple(w[i : i + 3]) for i in range(len(w) - 2))

    shingles = [sh3(t) for t in texts]
    near = sum(
        1
        for a_, b_ in itertools.combinations(range(len(texts)), 2)
        if shingles[a_] & shingles[b_]
        and len(shingles[a_] & shingles[b_]) / len(shingles[a_] | shingles[b_])
        >= 0.5
    )
    assert near >= 0.02 * len(texts)

    emb = pq.read_table(f"{out}/embeddings.parquet")
    assert all(len(v) == 64 for v in emb.column("embedding").to_pylist()[:10])

    ev = pq.read_table(f"{out}/events.parquet")
    users = set(ev.column("user_id").to_pylist())
    src_users = set(
        pq.read_table(f"{SF_DIR}/events.parquet").column("user_id").to_pylist()
    )
    assert users <= src_users  # hot-key skew domain preserved

    # determinism: same seed → identical tables
    out2 = build_reseed_dir(SF_DIR, str(tmp_path / "rs2"), seed=4242)
    assert pq.read_table(f"{out2}/documents.parquet").equals(docs)
