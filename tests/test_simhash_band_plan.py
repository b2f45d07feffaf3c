"""simhash_band_plan: the corpus-size coupling VERDICT r3 #4 demanded.

Three properties gate regressions:
1. every driver SF (n <= 8192) reproduces EXACTLY the legacy 32-bit
   (0,11)(11,11)(22,10) layout — so the static DuckDB oracle for
   q039_simhash_radius stays valid wherever the driver runs it;
2. beyond the floor, the width grows with log2(n) so expected
   distinct-sketch occupancy per (band, value) bucket stays bounded;
3. on uniform hash values the MEASURED max bucket occupancy under the
   plan stays flat as the corpus grows 8x and beyond, while the frozen
   32-bit layout's occupancy grows linearly — the sublinearity evidence
   the r3 docstring promised but nothing enforced.

Pure-python/numpy (no Spark): the property under test is the band-key
cardinality rule itself; the Spark plan shape for q039 is separately
gated by tests/test_plan_shape.py and the driver oracle.
"""

from __future__ import annotations

import numpy as np

from warcraider_spark.operators.dedup import (
    _SIMHASH_BANDS,
    SIMHASH_BUCKET_LOG2,
    SIMHASH_WIDE_BITS,
    simhash_band_plan,
)


def test_driver_sf_reproduces_certified_layout():
    # dup_corpus sizes: sf0.001/sf0.01 -> 620, sf0.1 -> 5120; anything
    # up to 8192 must keep the oracle-certified 32-bit layout.
    for n in (2, 620, 5120, 8192):
        bits, bands = simhash_band_plan(n)
        assert bits == SIMHASH_WIDE_BITS
        assert bands == _SIMHASH_BANDS


def test_width_grows_with_corpus_and_occupancy_bound_holds():
    prev_bits = 0
    for n in (10_000, 40_120, 200_000, 5_000_000):
        bits, bands = simhash_band_plan(n)
        assert bits >= prev_bits, "width must be monotone in corpus size"
        prev_bits = bits
        assert len(bands) == 3  # radius 2 -> pigeonhole needs r+1 bands
        # contiguous, disjoint, covering [0, bits)
        assert bands[0][0] == 0
        for (lo_a, w_a), (lo_b, _w_b) in zip(bands, bands[1:]):
            assert lo_a + w_a == lo_b
        assert bands[-1][0] + bands[-1][1] == bits
        # the rule's contract: expected occupancy n / 2^w <= 2^BUCKET_LOG2
        min_w = min(w for _lo, w in bands)
        assert n / (1 << min_w) <= (1 << SIMHASH_BUCKET_LOG2) * 2 + 1e-9


def test_radius_parameter_sets_band_count():
    for radius in (1, 2, 3):
        _bits, bands = simhash_band_plan(100_000, radius=radius)
        assert len(bands) == radius + 1


def _max_occupancy(hashes: np.ndarray, bands) -> int:
    worst = 0
    for lo, w in bands:
        vals = (hashes >> lo) & ((1 << w) - 1)
        _uniq, counts = np.unique(vals, return_counts=True)
        worst = max(worst, int(counts.max()))
    return worst


def test_measured_occupancy_flat_under_plan_linear_when_frozen():
    """Uniform sketches (the accidental-collision regime): max bucket
    occupancy under the adaptive plan stays O(1) from 5k to 320k docs,
    while the frozen 32-bit layout grows ~linearly past the floor."""
    rng = np.random.RandomState(0xC0FFEE)
    frozen_at_320k = plan_at_320k = None
    for n in (5_000, 40_000, 320_000):
        hashes = rng.randint(0, 1 << 62, size=n, dtype=np.int64)
        bits, bands = simhash_band_plan(n)
        occ_plan = _max_occupancy(hashes & ((1 << bits) - 1), bands)
        occ_frozen = _max_occupancy(hashes & ((1 << 32) - 1), _SIMHASH_BANDS)
        # Poisson tail: expected <= 8 per bucket; 60 is a generous
        # deterministic-seed ceiling (observed ~20-30)
        assert occ_plan <= 60, f"n={n}: plan occupancy {occ_plan} not flat"
        if n == 320_000:
            frozen_at_320k, plan_at_320k = occ_frozen, occ_plan
    # at 64x the floor corpus the frozen layout averages ~160 per bucket;
    # the widened plan must beat it by a wide margin
    assert frozen_at_320k > 4 * plan_at_320k
