"""Model-based randomized check of the MoR delete triad + maintenance:
a seeded random sequence of appends / equality upserts / positional
deletes / predicate deletes / compact_deletes / rewrite_deletes /
compact_partitions runs against BOTH the snapshot table layer and a
plain in-memory dict model; after EVERY op the table's visible rows
must equal the model exactly. This is the interleaving coverage the
example-based tests can't enumerate — e.g. a positional delete landing
on top of a folded global equality state, then a targeted compaction,
then another fold."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from iceberg_poc_spark.tables import ParquetTableManager


@pytest.fixture
def mgr(spark, tmp_path):
    return ParquetTableManager(spark, str(tmp_path / "wh"))


def _table_rows(mgr):
    return {
        (r.k, r.v, r.g) for r in mgr.read("m").collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 41, 58])
def test_random_mor_interleavings_match_model(mgr, spark, seed):
    rng = random.Random(seed)
    next_k = [0]

    def fresh_batch(n):
        rows = [
            (next_k[0] + i, f"v{seed}-{next_k[0] + i}", (next_k[0] + i) % 3)
            for i in range(n)
        ]
        next_k[0] += n
        return rows

    base = fresh_batch(30)
    df0 = spark.createDataFrame(base, "k long, v string, g int")
    mgr.create_table("m", df0.schema, [])
    mgr.append("m", df0)
    model: dict[int, tuple[str, int]] = {k: (v, g) for k, v, g in base}

    ops = ["append", "upsert", "pos_delete", "pred_delete",
           "compact_deletes", "rewrite_deletes", "compact_partitions"]
    for step in range(14):
        op = rng.choice(ops)
        if op == "append":
            rows = fresh_batch(rng.randint(1, 6))
            mgr.append(
                "m",
                spark.createDataFrame(rows, "k long, v string, g int")
                .coalesce(1),
            )
            model.update({k: (v, g) for k, v, g in rows})
        elif op == "upsert":
            live = sorted(model)
            if not live:
                continue
            targets = rng.sample(live, min(len(live), rng.randint(1, 5)))
            rows = [(k, f"u{step}-{k}", model[k][1]) for k in targets]
            new = fresh_batch(rng.randint(0, 2))
            rows += list(new)
            mgr.upsert_equality(
                "m",
                spark.createDataFrame(rows, "k long, v string, g int")
                .coalesce(1),
                ["k"],
            )
            model.update({k: (v, g) for k, v, g in rows})
        elif op == "pos_delete":
            live = sorted(model)
            if not live:
                continue
            targets = set(rng.sample(live, min(len(live), rng.randint(1, 4))))
            coords = (
                mgr.read_with_positions("m")
                .filter(F.col("k").isin(list(targets)))
                .select("_file_name", "_pos")
            )
            mgr.delete_positions("m", coords)
            for k in targets:
                model.pop(k, None)
        elif op == "pred_delete":
            live = sorted(model)
            if not live:
                continue
            lo = rng.choice(live)
            hi = lo + rng.randint(0, 8)
            mgr.delete(
                "m", [("k", ">=", lo), ("k", "<=", hi)],
                mode=rng.choice(["cow", "mor"]),
            )
            for k in [k for k in model if lo <= k <= hi]:
                model.pop(k, None)
        elif op == "compact_deletes":
            mgr.compact_deletes("m")
        elif op == "rewrite_deletes":
            mgr.rewrite_deletes("m")
        elif op == "compact_partitions":
            mgr.compact_partitions("m", min_files=2)
        got = _table_rows(mgr)
        want = {(k, v, g) for k, (v, g) in model.items()}
        assert got == want, (
            f"seed={seed} step={step} op={op}: "
            f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
        )
