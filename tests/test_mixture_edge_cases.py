"""Adversarial corpora for the r10 training-mixture trio (the r8
short-doc/zero-vector sweep pattern): shapes the sf testdata never
produces, run through the SAME Spark-vs-DuckDB oracle comparator so
every cross-engine hazard (integer div by zero, HUGEINT sums, empty
aggregates, window-over-one-row) is checked on BOTH engines, not
reasoned about.

Corpora:
- dominant: one domain holds ~94% of tokens — the water-fill MUST cap
  it (the operator's reason to exist) and the gate keeps ceil(30%) of a
  1-doc domain (=1).
- single_domain: |domains| = 1 — the cut arithmetic divides by
  (n - i + 1) = 1 and the budget simply truncates the one domain.
- sparse: empty-text docs mixed in — word_count 0 documents contribute
  0 tokens to their domain (never a div-by-zero: q011 filters them, and
  q009's level divisor is domain count, not tokens).
- uniform_tiny: every domain identical — ties broken by the (toks,
  source) sort key identically in both engines.
"""

from __future__ import annotations

import duckdb as _dd
import pytest

from warcraider_spark.oracle import run_oracle
from warcraider_spark.registry import all_specs

TRIO = [
    "q008_mixture_apply_select",
    "q009_domain_mixture_weights",
    "q010_dsir_select",
    "q011_domain_quality_select",
    # r11: the composed gate->water-fill->DSIR->pack plan inherits every
    # edge hazard of its stages PLUS coupling ones (a domain emptied by
    # the gate, a target slice that is the whole corpus, zero-token
    # survivors at the pack stage) — swept over the same corpora
    "q187_mixture_pipeline_e2e",
]


def _corpus(tmp_path, name: str, rows: list[tuple[int, str, str]]) -> str:
    d = tmp_path / name
    d.mkdir()
    con = _dd.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?,?,?,?,?)",
        [(i, t, "xx", s, len(t)) for i, t, s in rows],
    )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        (d / f"{t}.parquet").symlink_to(f"/root/testdata/sf0.001/{t}.parquet")
    return str(d)


def _corpora(tmp_path) -> dict[str, list[tuple[int, str, str]]]:
    dominant = [(i, "common filler words here now " * 40, "big") for i in range(9)]
    dominant += [(9, "rare niche tokens only", "small"), (10, "tiny bit", "mini")]
    single = [(i, f"alpha beta gamma delta {i}", "only") for i in range(8)]
    sparse = [
        (0, "", "a"),
        (1, "   ", "a"),
        (2, "one two three four five six", "a"),
        (3, "", "b"),
        (4, "seven eight nine ten", "b"),
        # single-doc domain small enough to fit its water-fill allocation:
        # without it the composed pipeline's greedy whole-doc fill admits
        # NOTHING on this corpus (budget < every gated doc — correct, but
        # vacuous for the hash sweep; the non-empty case must also occur)
        (7, "wee", "d"),
        (10, "target style text one two", "c"),
        (20, "target style text three four", "c"),
    ]
    uniform = [(i, "same five tokens every time", f"s{i % 4}") for i in range(12)]
    uniform.append((13, "solo", "s4"))  # same fit-the-allocation reason
    return {
        "dominant": dominant,
        "single_domain": single,
        "sparse": sparse,
        "uniform_tiny": uniform,
    }


@pytest.mark.parametrize("cname", ["dominant", "single_domain", "sparse", "uniform_tiny"])
def test_mixture_trio_edge_corpora(spark, tmp_path, cname):
    rows = _corpora(tmp_path)[cname]
    d = _corpus(tmp_path, cname, rows)
    specs = all_specs()
    for q in TRIO:
        r = run_oracle(spark, specs[q], d)
        assert r.ok, (cname, q, r.detail)


def test_waterfill_caps_dominant_domain(spark, tmp_path):
    """Semantic spot-check beyond hash equality: on the dominant corpus
    the 60% budget MUST cap the big domain while the small ones keep
    every token — the allocation the operator exists to produce."""
    d = _corpus(tmp_path, "dom2", _corpora(tmp_path)["dominant"])
    out = {
        r["source"]: r.asDict()
        for r in all_specs()["q009_domain_mixture_weights"].builder(spark, d).collect()
    }
    assert out["big"]["capped"] and out["big"]["alloc_tokens"] < out["big"]["domain_tokens"]
    assert not out["small"]["capped"]
    assert out["small"]["alloc_tokens"] == out["small"]["domain_tokens"]
    assert not out["mini"]["capped"]
    total = sum(v["domain_tokens"] for v in out.values())
    assert sum(v["alloc_tokens"] for v in out.values()) <= total * 6 // 10


# ---------------------------------------------------------------------------
# Closed-form water-fill: property proof of the algorithm itself
# ---------------------------------------------------------------------------

def _waterfill_closed_form(toks: list[int], num: int = 6, den: int = 10):
    """Pure-python mirror of the q009 SQL/DataFrame math (sort asc,
    prefix sums, first position whose domain reaches its candidate
    level), returning (allocations aligned to the input order, level or
    None)."""
    order = sorted(range(len(toks)), key=lambda i: (toks[i], i))
    total = sum(toks)
    b = total * num // den
    n = len(toks)
    prefix = 0
    cut_level = None
    for pos, idx in enumerate(order, start=1):
        level = (b - prefix) // (n - pos + 1)
        if toks[idx] >= level:
            cut_level = level
            break
        prefix += toks[idx]
    if cut_level is None:
        return list(toks), None
    return [min(t, cut_level) for t in toks], cut_level


def test_waterfill_closed_form_properties():
    """The closed form must BE the integer water-fill: (a) the budget is
    respected; (b) every uncapped domain keeps all its tokens and sits
    at or below the level; (c) floor-tightness — the unallocated
    remainder is strictly smaller than the number of capped domains
    (the floor-division property the declared semantics guarantee);
    (d) allocation is monotone in domain size. Hypothesis drives the
    shapes (empty-ish, ties, zeros, one giant)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40))
    def check(toks):
        alloc, level = _waterfill_closed_form(toks)
        total = sum(toks)
        budget = total * 6 // 10
        assert sum(alloc) <= max(budget, 0)
        if level is None:
            assert alloc == list(toks)
            assert total <= budget or total == 0 or budget >= total
        else:
            for t, a in zip(toks, alloc):
                assert a == min(t, level)
            # tightness: the closed form allocates prefix + k*level with
            # level = floor((b - prefix) / k) over the k capped domains,
            # so the unallocated remainder is the floor-division remainder —
            # strictly less than k. (r15: the previous "bumping the
            # shared level by one must break the budget" claim was
            # OVERSTATED — when some capped domains sit exactly AT the
            # level, a +1 bump only costs #(t >= level+1) tokens, which
            # can fit inside the remainder; hypothesis found
            # toks=[1765x4, 1324, 8537]. The declared q009/q187 floor
            # semantics are oracle-certified; the test now asserts the
            # property the floor form actually guarantees.)
            n_capped = sum(1 for t in toks if t >= level)
            leftover = budget - sum(alloc)
            assert 0 <= leftover < max(n_capped, 1)
            # monotone: bigger domain never allocated less
            pairs = sorted(zip(toks, alloc))
            for (t1, a1), (t2, a2) in zip(pairs, pairs[1:]):
                assert a1 <= a2

    check()


# ---------------------------------------------------------------------------
# r11: composed-pipeline invariants (q187) — semantic checks beyond hash
# equality, plus a hypothesis proof of the fill coupling
# ---------------------------------------------------------------------------


def test_composed_pipeline_invariants(spark, tmp_path):
    """Invariants a correct gate->water-fill->DSIR->pack composition
    must satisfy, asserted on the SPARK OUTPUT (the oracle hash only
    proves cross-engine agreement — both engines could share a bug):
    (a) the target seed slice (doc_id % 10 == 0) is never selected;
    (b) per domain, selected tokens never exceed the water-fill
        allocation computed over the GATED pool, and the global
        selection never exceeds the 60% budget of that pool;
    (c) the selection is the MAXIMAL greedy prefix in (score desc, id)
        order — the next unselected doc per domain would overflow;
    (d) packing arithmetic: start_offset = cum - toks, bin_id =
        start_offset div 2048, and cum is the running sum in emission
        order within each domain."""
    from warcraider_spark.registry import all_specs

    d = _corpus(tmp_path, "inv", _corpora(tmp_path)["dominant"])
    specs = all_specs()
    sel = [r.asDict() for r in specs["q187_mixture_pipeline_e2e"].builder(spark, d).collect()]
    assert sel, "dominant corpus must yield a non-empty selection"
    # (a) target exclusion
    assert all(r["doc_id"] % 10 != 0 for r in sel)

    # python recomputation of the gate + allocation over this corpus
    # (house ASCII ttr gate, unicode word counts, the water-fill mirror)
    import re as _re

    rows = _corpora(tmp_path)["dominant"]
    pool = []  # (doc_id, source, ttr_bp, wc)
    for i, t, s in rows:
        if i % 10 == 0 or not t.strip(" "):
            continue
        toks = _re.split(r"\s+", t.strip(" "), flags=_re.ASCII)
        ttr = len(set(toks)) * 10000 // len(toks)
        pool.append((i, s, ttr, len(t.split())))
    gated: dict = {}
    for i, s, ttr, wc in pool:
        gated.setdefault(s, []).append((i, ttr, wc))
    g: dict = {}
    for s, docs in gated.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        n = len(docs)
        keep = [d for rk, d in enumerate(docs, 1) if rk * 10 <= n * 3 + 9]
        g[s] = {i: wc for i, _, wc in keep}
    srcs = sorted(g)
    allocs, _ = _waterfill_closed_form([sum(g[s].values()) for s in srcs])
    alloc = dict(zip(srcs, allocs))
    # (b) per-domain and global budget respect, (c) prefix-maximality
    total_gated = sum(sum(v.values()) for v in g.values())
    sel_by_dom: dict = {}
    for r in sel:
        sel_by_dom.setdefault(r["source"], 0)
        sel_by_dom[r["source"]] += r["toks"]
        assert r["cum"] <= alloc[r["source"]]
    assert sum(sel_by_dom.values()) <= total_gated * 6 // 10
    for s, rows_s in g.items():
        picked = {r["doc_id"] for r in sel if r["source"] == s}
        unpicked = [wc for i, wc in rows_s.items() if i not in picked]
        used = sel_by_dom.get(s, 0)
        assert used <= alloc[s]
        # greedy maximality: on this corpus every gated doc within a
        # domain is identical (same score), so ANY unpicked doc must
        # overflow the remaining allocation
        if unpicked:
            assert used + min(unpicked) > alloc[s]
    # (b)+(c)+(d) per domain
    bydom: dict = {}
    for r in sel:
        bydom.setdefault(r["source"], []).append(r)
    for src, rows in bydom.items():
        rows.sort(key=lambda r: r["cum"])
        run = 0
        for r in rows:
            run += r["toks"]
            assert r["cum"] == run
            assert r["start_offset"] == r["cum"] - r["toks"]
            assert r["bin_id"] == r["start_offset"] // 2048
            assert r["straddles"] == (
                r["toks"] > 0 and r["start_offset"] // 2048 != (r["cum"] - 1) // 2048
            )


def test_fill_coupling_properties():
    """Hypothesis proof of the water-fill -> greedy-fill COUPLING (the
    stage q187 adds over q009): for any per-domain token counts and any
    score order, filling each domain greedily against its closed-form
    allocation (1) never exceeds the allocation, (2) is prefix-maximal
    (the first unselected doc would overflow), and (3) the global
    selection respects the budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(  # domains: each a list of doc token counts
            st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        )
    )
    def prop(domains):
        dom_toks = [sum(ds) for ds in domains]
        allocs, _ = _waterfill_closed_form(dom_toks)
        total_sel = 0
        for ds, alloc in zip(domains, allocs):
            cum = 0
            selected = []
            rest = []
            for t in ds:  # generation order stands in for score order
                if cum + t <= alloc:
                    cum += t
                    selected.append(t)
                elif not rest:
                    rest.append(t)
            assert cum <= alloc
            if rest:
                assert cum + rest[0] > alloc  # prefix-maximal
            total_sel += cum
        assert total_sel <= sum(dom_toks) * 6 // 10

    prop()
