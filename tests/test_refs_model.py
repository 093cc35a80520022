"""Model-based property test of the REFS layer (branches / tags /
fast-forward / expiry) — the machinery under write-audit-publish,
cross-ref changelogs, and the streaming WAP sink.

hypothesis drives random ref-op sequences against BOTH the real
ParquetTableManager and a trivial in-memory model that tracks, per ref,
the row multiset AND the commit-id chain. The chain is what makes
fast-forward predictable: the engine's rule (target must descend from
the current head) is exactly "current chain is a prefix of the target
chain" in the model, so the test asserts not just that states match but
that publish/divergence OUTCOMES match — including the failure cases
the curated WAP scenarios never reach (publish after main advanced,
re-publish of an already-published branch, ffwd of a stale branch).
Expiry runs inside the sequence; tag-pinned states must stay readable
and every live ref must still resolve.
"""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from iceberg_poc_spark.tables import ParquetTableManager

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), False),
        StructField("v", LongType(), False),
    ]
)

BRANCHES = ("b0", "b1")
TAGS = ("t0", "t1")
REFS = ("main",) + BRANCHES

batch = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 50)), min_size=1, max_size=4
)

op = st.one_of(
    st.tuples(st.just("append"), st.sampled_from(REFS), batch),
    st.tuples(st.just("create_branch"), st.sampled_from(BRANCHES)),
    st.tuples(st.just("drop_branch"), st.sampled_from(BRANCHES)),
    st.tuples(st.just("create_tag"), st.sampled_from(TAGS)),
    st.tuples(st.just("fast_forward"), st.sampled_from(BRANCHES)),
    st.tuples(st.just("expire"), st.integers(1, 3)),
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(ops=st.lists(op, min_size=2, max_size=8))
def test_refs_layer_matches_model_under_random_ops(spark, ops):
    wh = tempfile.mkdtemp(prefix="refs_model_wh_")
    try:
        mgr = ParquetTableManager(spark, wh)
        mgr.create_table("t", SCHEMA, [])
        # model: per live ref, (row multiset, commit-id chain); tags pin
        # (multiset, engine snapshot id) forever
        state: dict[str, Counter] = {"main": Counter()}
        chain: dict[str, tuple[int, ...]] = {"main": (0,)}
        tags: dict[str, tuple[Counter, int]] = {}
        next_cid = 1
        for o in ops:
            kind = o[0]
            if kind == "append":
                _, ref, rows = o
                if ref not in state:
                    with pytest.raises(ValueError):
                        mgr.append("t", _df(spark, rows), ref=ref)
                    continue
                mgr.append("t", _df(spark, rows), ref=ref)
                state[ref] = state[ref] + Counter(tuple(r) for r in rows)
                chain[ref] = chain[ref] + (next_cid,)
                next_cid += 1
            elif kind == "create_branch":
                b = o[1]
                if b in state:
                    with pytest.raises(ValueError):
                        mgr.create_branch("t", b)
                    continue
                mgr.create_branch("t", b)
                state[b] = Counter(state["main"])
                chain[b] = chain["main"]
            elif kind == "drop_branch":
                b = o[1]
                if b not in state:
                    continue  # engine would FileNotFoundError; not a contract
                mgr.drop_branch("t", b)
                del state[b], chain[b]
            elif kind == "create_tag":
                t = o[1]
                if t in tags:
                    with pytest.raises(ValueError):
                        mgr.create_tag("t", t)
                    continue
                snap = mgr.create_tag("t", t)
                tags[t] = (Counter(state["main"]), snap)
            elif kind == "fast_forward":
                b = o[1]
                if b not in state:
                    with pytest.raises(ValueError):
                        mgr.fast_forward("t", b)
                    continue
                # the engine rule in chain form: main's chain must be a
                # prefix of the branch's (equal chains = no-op success)
                mc, bc = chain["main"], chain[b]
                if mc == bc or bc[: len(mc)] == mc:
                    mgr.fast_forward("t", b)
                    state["main"] = Counter(state[b])
                    chain["main"] = bc
                else:
                    with pytest.raises(ValueError):
                        mgr.fast_forward("t", b)
            elif kind == "expire":
                mgr.expire_snapshots("t", keep_last=o[1])
        # every live ref resolves to exactly the model's multiset
        for ref, want in state.items():
            got = Counter(
                (r.k, r.v) for r in mgr.read("t", ref=ref).collect()
            )
            assert got == want, f"ref {ref}"
        # tag-pinned states survived everything, including expiry
        for t, (want, snap) in tags.items():
            got = Counter(
                (r.k, r.v) for r in mgr.read("t", snapshot_id=snap).collect()
            )
            assert got == want, f"tag {t}"
        # the refs listing agrees on what exists
        listed = {r.ref for r in mgr.refs("t").collect()}
        assert listed == set(state) | set(tags)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
