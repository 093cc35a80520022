"""Model-based property test of the snapshot table layer: hypothesis
drives random operation sequences (append / delete / update / dynamic
overwrite / CDC merge / compact) against BOTH the real
ParquetTableManager and a trivial in-memory multiset model, then checks
that every snapshot in the committed history time-travels back to
exactly the model's state at that point.

This is the strongest correctness artifact for the most custom code in
the engine: the oracle-gated queries check one curated scenario per
capability; this checks arbitrary interleavings, including the
cross-interactions (merge after overwrite after delete) no curated
scenario covers. Partition values are derived from the key (part = k%4)
so they co-travel with it — the standing assumption behind the merge's
partition-granular CoW file selection.
"""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from iceberg_poc_spark.tables import ParquetTableManager, identity

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), False),
        StructField("part", IntegerType(), False),
        StructField("v", LongType(), False),
    ]
)

kv = st.tuples(st.integers(0, 24), st.integers(0, 100))
batch = st.lists(kv, min_size=1, max_size=6)

op = st.one_of(
    st.tuples(st.just("append"), batch),
    st.tuples(st.just("delete_part"), st.integers(0, 3)),
    st.tuples(st.just("delete_v"), st.integers(0, 100)),
    st.tuples(st.just("delete_part_mor"), st.integers(0, 3)),
    st.tuples(st.just("delete_v_mor"), st.integers(0, 100)),
    st.tuples(st.just("update"), st.integers(0, 3), st.integers(1, 9)),
    st.tuples(st.just("overwrite"), batch),
    st.tuples(st.just("merge"), batch, st.lists(st.integers(0, 24), max_size=3)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("rewrite_deletes")),
)


def _rows(pairs):
    return [(k, k % 4, v) for k, v in pairs]


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
@given(ops=st.lists(op, min_size=1, max_size=6))
def test_table_layer_matches_model_under_random_ops(spark, ops):
    wh = tempfile.mkdtemp(prefix="model_wh_")
    try:
        mgr = ParquetTableManager(spark, wh)
        mgr.create_table("t", SCHEMA, [identity("part")])
        model: list[tuple[int, int, int]] = []
        history: dict[int, Counter] = {}
        for o in ops:
            kind = o[0]
            if kind == "append":
                rows = _rows(o[1])
                snap = mgr.append("t", _df(spark, rows))
                model.extend(rows)
            elif kind == "delete_part":
                p = o[1]
                snap = mgr.delete("t", [("part", "==", p)])
                model = [r for r in model if r[1] != p]
            elif kind == "delete_v":
                x = o[1]
                snap = mgr.delete("t", [("v", "<", x)])
                model = [r for r in model if not r[2] < x]
            elif kind == "delete_part_mor":
                p = o[1]
                snap = mgr.delete("t", [("part", "==", p)], mode="mor")
                model = [r for r in model if r[1] != p]
            elif kind == "delete_v_mor":
                x = o[1]
                snap = mgr.delete("t", [("v", "<", x)], mode="mor")
                model = [r for r in model if not r[2] < x]
            elif kind == "rewrite_deletes":
                snap = mgr.rewrite_deletes("t")
            elif kind == "update":
                p, d = o[1], o[2]
                snap = mgr.update(
                    "t",
                    {"v": F.col("v") + F.lit(d).cast("long")},
                    [("part", "==", p)],
                )
                model = [
                    (k, pp, v + d) if pp == p else (k, pp, v)
                    for k, pp, v in model
                ]
            elif kind == "overwrite":
                rows = _rows(o[1])
                snap = mgr.overwrite_partitions("t", _df(spark, rows))
                touched = {r[1] for r in rows}
                model = [r for r in model if r[1] not in touched] + rows
            elif kind == "merge":
                ups, del_keys = _rows(o[1]), o[2]
                src = spark.createDataFrame(
                    [(k, p, v, "U") for k, p, v in ups]
                    + [(k, k % 4, 0, "D") for k in del_keys],
                    "k INT, part INT, v BIGINT, op STRING",
                )
                snap = mgr.merge(
                    "t", src, on=["k"], delete_when=F.col("op") == "D"
                )
                all_keys = {k for k, _p, _v in ups} | set(del_keys)
                model = [r for r in model if r[0] not in all_keys] + ups
            else:  # compact
                snap = mgr.compact("t")
            history[snap] = Counter(model)

        # head equals the final model state
        got = Counter((r.k, r.part, r.v) for r in mgr.read("t").collect())
        assert got == Counter(model)
        # EVERY committed snapshot time-travels to its recorded state
        for snap, want in history.items():
            got = Counter(
                (r.k, r.part, r.v)
                for r in mgr.read("t", snapshot_id=snap).collect()
            )
            assert got == want, f"snapshot {snap} diverged"
    finally:
        shutil.rmtree(wh, ignore_errors=True)
