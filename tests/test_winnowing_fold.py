"""r13 (VERDICT r12 #3): the winnowing operator's default shuffle key is
the xxhash64 FOLD of each selected k-gram (8-byte bigint) instead of the
20-char string. The fold is post-selection — which positions are
fingerprinted is decided by string min before the hash — so the output
pair set and every n_shared count must be IDENTICAL to the string form
on any corpus without a 64-bit collision among its selected grams.
These tests pin that equality on random corpora, and pin that the fold
actually changed the shuffled type (bigint key, no string fp column)."""

from __future__ import annotations

import random
import string

from warcraider_spark.operators.dedup import _winnow_fp, winnowing_pairs


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def _corpus(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    """Random docs with planted shared runs of assorted lengths so the
    pair output is non-trivial: some pairs above the >=2 shared-fp
    threshold, some at exactly one shared fingerprint, some disjoint."""
    rng = random.Random(seed)
    shared_runs = [_rand_text(rng, rng.randint(27, 90)) for _ in range(6)]
    docs = []
    for i in range(1, n_docs + 1):
        parts = [_rand_text(rng, rng.randint(0, 120))]
        for run in shared_runs:
            if rng.random() < 0.3:
                parts.append(run)
                parts.append(_rand_text(rng, rng.randint(0, 60)))
        docs.append((i, "".join(parts)))
    return docs


def _pairs(df) -> dict[tuple[int, int], int]:
    return {(r.doc_a, r.doc_b): r.n_shared for r in df.collect()}


def test_fold_equals_string_on_random_corpora(spark):
    for seed in (3, 17, 101):
        docs = spark.createDataFrame(_corpus(seed), "doc_id long, text string")
        folded = _pairs(winnowing_pairs(docs, fold=True))
        strings = _pairs(winnowing_pairs(docs, fold=False))
        assert folded == strings, f"seed {seed}: fold changed the output"
        assert folded, f"seed {seed}: degenerate corpus (no pairs) proves nothing"


def test_fold_shuffles_bigint_not_string(spark):
    """r14: the selector lives in _winnow_fp (shared by every consumer),
    so the fold/schema pins live on it directly."""
    docs = spark.createDataFrame(_corpus(23), "doc_id long, text string")
    plan = _winnow_fp(docs, fold=True)._jdf.queryExecution().toString()
    # the exploded fingerprint column is the xxhash64 bigint
    assert "xxhash64" in plan
    # schema-level pin: the explode output type under each mode
    assert dict(_winnow_fp(docs, fold=True).dtypes)["f"] == "bigint"
    assert dict(_winnow_fp(docs, fold=False).dtypes)["f"] == "string"


def test_spread_is_explicit_not_probed(spark):
    """ADVICE r12: the spread decision must be static — same logical plan
    for the same arguments regardless of input split layout. With
    spread_partitions=None there is no repartition of the input; with an
    explicit target there is exactly one round-robin exchange."""
    docs = spark.createDataFrame(_corpus(5), "doc_id long, text string")
    plan_none = _winnow_fp(docs)._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning" not in plan_none.split("== Physical Plan ==")[-1]
    plan_spread = (
        _winnow_fp(docs, spread_partitions=8)._jdf.queryExecution().toString()
    )
    phys = plan_spread.split("== Physical Plan ==")[-1]
    # The pin is the exchange's presence and explicit target on the
    # shared selector; winnowing_pairs re-declares the lineage per
    # consumer in the printed tree and AQE reuses it at runtime.
    assert "RoundRobinPartitioning(8)" in phys
