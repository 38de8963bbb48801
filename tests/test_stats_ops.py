"""Hand-computed truths for operators/stats_tests.py and
operators/graph_metrics.py — independent of the DuckDB oracle (which
cross-checks the same algebra); these pin the STATISTICS themselves on
textbook-sized inputs.
"""

from __future__ import annotations

import math

import pytest

from arrow_spark.operators.graph_metrics import (
    degree_assortativity,
    jaccard_link_prediction,
)
from arrow_spark.operators.stats_tests import (
    bh_adjust,
    chi_square_cells,
    decile_lift,
    ks_two_sample,
    two_proportion_ztest,
)


def test_chi_square_2x2_hand_truth(spark):
    # classic 2x2: obs [[10, 20], [20, 10]], N=60
    rows = (
        [("a1", "b1")] * 10 + [("a1", "b2")] * 20
        + [("a2", "b1")] * 20 + [("a2", "b2")] * 10
    )
    df = spark.createDataFrame(rows, "x string, y string")
    out = {(r["a"], r["b"]): r for r in chi_square_cells(df, "x", "y").collect()}
    cell = out[("a1", "b1")]
    assert cell["obs"] == 10 and cell["row_tot"] == 30 and cell["col_tot"] == 30
    assert cell["expected"] == pytest.approx(15.0)
    # contrib = (10-15)^2/15 = 25/15
    assert cell["contrib"] == pytest.approx(25.0 / 15.0)
    chi2 = sum(r["contrib"] for r in out.values())
    assert chi2 == pytest.approx(4 * 25.0 / 15.0)


def test_two_proportion_ztest_hand_truth(spark):
    # group 0: 50 trials 30 successes; group 1: 50 trials 20 successes
    rows = (
        [(0, 1)] * 30 + [(0, 0)] * 20 + [(1, 1)] * 20 + [(1, 0)] * 30
    )
    df = spark.createDataFrame(rows, "g int, s int")
    r = two_proportion_ztest(df, "g", "s").collect()[0]
    assert (r["n0"], r["x0"], r["n1"], r["x1"]) == (50, 30, 50, 20)
    p_pool = 0.5
    se = math.sqrt(p_pool * 0.5 * (1 / 50 + 1 / 50))
    assert r["z"] == pytest.approx((0.6 - 0.4) / se)


def test_ks_two_sample_hand_truth(spark):
    # sample 0: {1,2,3,4}; sample 1: {3,4,5,6} → D = 1/2 at value 2
    rows = [(1.0, 0), (2.0, 0), (3.0, 0), (4.0, 0),
            (3.0, 1), (4.0, 1), (5.0, 1), (6.0, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    r = ks_two_sample(df, "v", "g").collect()[0]
    assert (r["n0"], r["n1"]) == (4, 4)
    assert r["ks_stat"] == pytest.approx(0.5)
    assert r["ks_at_value"] == 2.0  # smallest value attaining the max


def test_bh_adjust_hand_truth(spark):
    # p = (.01, .02, .03, .04): raw = (.04, .04, .04, .04) → all .04
    df = spark.createDataFrame(
        [("h1", 0.01), ("h2", 0.02), ("h3", 0.03), ("h4", 0.04)],
        "h string, p double",
    )
    out = {r["h"]: r for r in bh_adjust(df, "p", "h").collect()}
    for h in ("h1", "h2", "h3", "h4"):
        assert out[h]["p_adjusted"] == pytest.approx(0.04)
    # and a non-flat case: (.01, .40) → (.02, .40)
    df2 = spark.createDataFrame([("a", 0.01), ("b", 0.40)], "h string, p double")
    out2 = {r["h"]: r["p_adjusted"] for r in bh_adjust(df2, "p", "h").collect()}
    assert out2["a"] == pytest.approx(0.02)
    assert out2["b"] == pytest.approx(0.40)


def test_decile_lift_mechanics(spark):
    # 20 entities, scores 20..1; positives exactly the top 5 scores
    rows = [(21 - i, 1 if 21 - i > 15 else 0, i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "score long, y long, k long")
    out = {r["tile"]: r for r in decile_lift(df, "score", "y", "k").collect()}
    assert out[1]["pos"] == 2 and out[1]["n"] == 2
    assert out[1]["lift"] == pytest.approx((2 * 20) / (2 * 5))  # = 4x
    assert out[3]["pos"] == 1  # scores 16 lands in tile 3
    assert out[10]["pos"] == 0
    assert out[10]["cum_gain"] == pytest.approx(1.0)


def test_degree_assortativity_star_graph(spark):
    # star K_{1,3}: hub degree 3, leaves degree 1 → r = -1
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src int, dst int"
    )
    r = degree_assortativity(df).collect()[0]
    assert r["n_edges"] == 3 and r["m_stubs"] == 6
    assert r["assortativity"] == pytest.approx(-1.0)


def test_degree_assortativity_regular_graph_null(spark):
    # triangle: all degrees 2 → zero variance → NULL, not an error
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    r = degree_assortativity(df).collect()[0]
    assert r["assortativity"] is None


def test_jaccard_link_prediction_path_graph(spark):
    # path 1-2-3-4: non-edges (1,3),(2,4) share 1 neighbor;
    # (1,4) shares none. jaccard(1,3) = 1/(1+2-1) = 0.5
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    out = {(r["x"], r["y"]): r["jaccard"] for r in
           jaccard_link_prediction(df, k=10).collect()}
    assert out[(1, 3)] == pytest.approx(0.5)
    assert out[(2, 4)] == pytest.approx(0.5)
    assert (1, 4) not in out  # no common neighbor → no wedge candidate


def test_spearman_perfect_monotone(spark):
    # y strictly increasing in x → rho = +1; y strictly decreasing → -1
    rows = [("g", i, i * 2) for i in range(1, 9)] + [
        ("h", i, 100 - i) for i in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    from arrow_spark.operators.stats_tests import spearman_corr

    out = {r["grp"]: r for r in spearman_corr(df, "grp", "x", "y").collect()}
    assert out["g"]["n_pairs"] == 8 and out["g"]["rho"] == pytest.approx(1.0)
    assert out["h"]["rho"] == pytest.approx(-1.0)


def test_spearman_ties_hand_truth(spark):
    # x = [1,1,2], y = [1,2,3]: avg ranks x = [1.5,1.5,3], y = [1,2,3]
    # rho = cov/sd·sd on ranks = ((1.5-2)(1-2)+(1.5-2)(2-2)+(3-2)(3-2))
    #       / sqrt(0.5^2+0.5^2+1) / sqrt(2) = 1.5/(sqrt(1.5)*sqrt(2))
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 2), ("g", 2, 3)], "grp string, x long, y long"
    )
    from arrow_spark.operators.stats_tests import spearman_corr

    r = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert r["rho"] == pytest.approx(1.5 / (math.sqrt(1.5) * math.sqrt(2.0)))


def test_brown_forsythe_hand_truth(spark):
    # group a: [1,2,3] (med 2, |z| = [1,0,1]); group b: [10,30] (med 20,
    # |z| = [10,10]). mean_absdev: a=2/3, b=10. within_ss: a = sum(z^2)
    # - n*zbar^2 = 2 - 3*(4/9) = 2/3; b = 200 - 2*100 = 0.
    # grand zbar = (1+0+1+10+10)/5 = 4.4;
    # between a = 3*(2/3-4.4)^2, b = 2*(10-4.4)^2
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 30)]
    df = spark.createDataFrame(rows, "grp string, v long")
    from arrow_spark.operators.stats_tests import brown_forsythe_cells

    out = {r["grp"]: r for r in brown_forsythe_cells(df, "grp", "v").collect()}
    a, b = out["a"], out["b"]
    assert a["n"] == 3 and b["n"] == 2
    assert a["mean_absdev"] == pytest.approx(2.0 / 3.0)
    assert b["mean_absdev"] == pytest.approx(10.0)
    assert a["within_ss"] == pytest.approx(2.0 / 3.0)
    assert b["within_ss"] == pytest.approx(0.0)
    assert a["between_term"] == pytest.approx(3 * (2.0 / 3.0 - 4.4) ** 2)
    assert b["between_term"] == pytest.approx(2 * (10.0 - 4.4) ** 2)


def test_brown_forsythe_even_group_median_interpolates(spark):
    # [1,2]: interpolated median 1.5 → doubled lattice med2 = 3,
    # deviations |2v-3|/2 = [0.5, 0.5] → mean_absdev 0.5, within_ss 0
    df = spark.createDataFrame([("g", 1), ("g", 2)], "grp string, v long")
    from arrow_spark.operators.stats_tests import brown_forsythe_cells

    r = brown_forsythe_cells(df, "grp", "v").collect()[0]
    assert r["mean_absdev"] == pytest.approx(0.5)
    assert r["within_ss"] == pytest.approx(0.0)


def test_reciprocity_two_cycle_and_dag(spark):
    from arrow_spark.operators.graph_metrics import reciprocity

    # 2-cycle: both edges reciprocated → 1.0 (self-loop excluded)
    cyc = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3)], "src long, dst long"
    )
    r = reciprocity(cyc).collect()[0]
    assert (r["n_edges"], r["n_recip"]) == (2, 2)
    assert r["reciprocity"] == pytest.approx(1.0)
    # star DAG: no reverse edges → 0.0
    star = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    r = reciprocity(star).collect()[0]
    assert (r["n_edges"], r["n_recip"]) == (3, 0)
    assert r["reciprocity"] == pytest.approx(0.0)
    # mixed: 1<->2 reciprocated, 1->3 not → 2/3
    mix = spark.createDataFrame([(1, 2), (2, 1), (1, 3)], "src long, dst long")
    r = reciprocity(mix).collect()[0]
    assert r["reciprocity"] == pytest.approx(2.0 / 3.0)
    # duplicate directed edges are deduplicated, never join-fanned-out:
    # without distinct(), (1,2)x3 + (2,1)x2 would count 3*2=6 reciprocal
    # hits over 5 edges and read reciprocity > 1
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (2, 1), (2, 1)], "src long, dst long"
    )
    r = reciprocity(dup).collect()[0]
    assert (r["n_edges"], r["n_recip"]) == (2, 2)
    assert r["reciprocity"] == pytest.approx(1.0)


def test_spearman_zero_variance_group_is_null(spark):
    # constant x in group → zero rank variance → denominator 0 → NULL
    # on BOTH engines (Spark non-ANSI /0 and DuckDB double /0 are NULL),
    # so the hash contract holds without a CASE guard
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3)], "grp string, x long, y long"
    )
    from arrow_spark.operators.stats_tests import spearman_corr

    r = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert r["n_pairs"] == 3 and r["rho"] is None


def test_brown_forsythe_single_group_between_term_zero(spark):
    # one group: z-bar_i == grand z-bar → between_term exactly 0
    df = spark.createDataFrame(
        [("g", v) for v in (1, 5, 9, 13)], "grp string, v long"
    )
    from arrow_spark.operators.stats_tests import brown_forsythe_cells

    r = brown_forsythe_cells(df, "grp", "v").collect()[0]
    assert r["between_term"] == 0.0


def test_session_runs_ansi_mode(spark):
    """The degenerate-input guards in this repo target Spark 4's ANSI
    default (where /0 THROWS instead of returning NULL). If this pin
    ever fails, the guards are still correct but no longer exercised
    as crash protection — re-audit before relaxing."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_mann_whitney_u_hand_truth(spark):
    from arrow_spark.operators.stats_tests import mann_whitney_u

    # g0=[1,2,3], g1=[2,3,4]: pooled tie-avg ranks 1,2.5,2.5,4.5,4.5,6
    # R1=13, U1=7, U0=2, T=12, var=4.95, z=5/(2*sqrt(4.95))
    rows = [(1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (4, 1)]
    df = spark.createDataFrame(rows, "v long, g long")
    r = mann_whitney_u(df, "v", "g").collect()[0]
    assert (r["n0"], r["n1"]) == (3, 3)
    assert r["r1_x2"] == 26 and r["u1_x2"] == 14 and r["u0_x2"] == 4
    assert r["tie_t"] == pytest.approx(12.0)
    assert r["z"] == pytest.approx(5.0 / (2.0 * 4.95**0.5))


def test_mann_whitney_u_degenerate_all_ties_z_null(spark):
    from arrow_spark.operators.stats_tests import mann_whitney_u

    df = spark.createDataFrame([(7, 0), (7, 0), (7, 1)], "v long, g long")
    r = mann_whitney_u(df, "v", "g").collect()[0]
    assert r["z"] is None  # var = 0: undefined, never an ANSI /0


def test_mann_whitney_u_empty_group_z_null(spark):
    from arrow_spark.operators.stats_tests import mann_whitney_u

    df = spark.createDataFrame([(1, 0), (2, 0)], "v long, g long")
    r = mann_whitney_u(df, "v", "g").collect()[0]
    assert r["n1"] == 0 and r["z"] is None


def test_anova_oneway_cells_hand_truth(spark):
    from arrow_spark.operators.stats_tests import anova_oneway_cells

    rows = [("A", 1), ("A", 2), ("A", 3), ("B", 5), ("B", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in anova_oneway_cells(df, "g", "v").collect()}
    assert got["A"]["n"] == 3 and got["A"]["mean"] == pytest.approx(2.0)
    assert got["A"]["within_ss"] == pytest.approx(2.0)
    assert got["A"]["between_term"] == pytest.approx(7.68)
    assert got["B"]["within_ss"] == pytest.approx(2.0)
    assert got["B"]["between_term"] == pytest.approx(11.52)


def test_jarque_bera_hand_truth(spark):
    from arrow_spark.operators.stats_tests import jarque_bera

    df = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    r = jarque_bera(df, "v").collect()[0]
    assert r["n"] == 4 and r["mean"] == pytest.approx(2.5)
    assert r["m2"] == pytest.approx(1.25)
    assert r["skew"] == pytest.approx(0.0)
    assert r["kurtosis_excess"] == pytest.approx(-1.36)
    assert r["jb"] == pytest.approx(4.0 / 6.0 * (1.36**2 / 4.0))


def test_jarque_bera_constant_column_null(spark):
    from arrow_spark.operators.stats_tests import jarque_bera

    df = spark.createDataFrame([(5,), (5,), (5,)], "v long")
    r = jarque_bera(df, "v").collect()[0]
    assert r["m2"] == pytest.approx(0.0)
    assert r["skew"] is None and r["jb"] is None


def test_abc_classify_hand_truth(spark):
    from arrow_spark.operators.pareto import abc_classify

    rows = [("p1", 50), ("p2", 30), ("p3", 12), ("p4", 5), ("p5", 3)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: (r["cum_value"], r["abc"]) for r in abc_classify(df, "k", "v").collect()}
    # desc cumulative: 50, 80, 92, 97, 100 of total 100
    assert got == {
        "p1": (50, "A"),   # 50 <= 70
        "p2": (80, "B"),   # 80 <= 90
        "p3": (92, "C"),
        "p4": (97, "C"),
        "p5": (100, "C"),
    }


def test_abc_classify_plan_no_global_window(spark):
    from arrow_spark.operators.pareto import abc_classify

    df = spark.createDataFrame([(str(i), i) for i in range(200)], "k string, v long")
    plan = (
        abc_classify(df, "k", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_kendall_tau_lattice_monotone_and_anti(spark):
    from arrow_spark.operators.stats_tests import kendall_tau_lattice

    up = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "x long, y long")
    r = kendall_tau_lattice(up, "x", "y", grid=4).collect()[0]
    assert (r["concordant"], r["discordant"]) == (3.0, 0.0)
    assert r["tau_b"] == pytest.approx(1.0)

    down = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], "x long, y long")
    r = kendall_tau_lattice(down, "x", "y", grid=4).collect()[0]
    assert (r["concordant"], r["discordant"]) == (0.0, 3.0)
    assert r["tau_b"] == pytest.approx(-1.0)


def test_kendall_tau_lattice_ties_and_constant_axis(spark):
    from arrow_spark.operators.stats_tests import kendall_tau_lattice

    # constant x axis: every pair is an x-tie, tau undefined -> NULL
    const = spark.createDataFrame([(5, 1), (5, 2), (5, 3)], "x long, y long")
    r = kendall_tau_lattice(const, "x", "y", grid=4).collect()[0]
    assert r["ties_x"] == pytest.approx(3.0) and r["tau_b"] is None

    # mixed: (1,1),(2,2),(2,3),(3,1) at fine grid: C pairs {12,13}=2... 
    # brute force: pairs (1,2):C (1,3):C (1,4):D? (1,1)v(3,1): y tie.
    # (2,3): x tie. (2,4):D. (3,4):D. C=2 D=2 tx=1 ty=1 n0=6
    mixed = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (3, 1)], "x long, y long"
    )
    r = kendall_tau_lattice(mixed, "x", "y", grid=8).collect()[0]
    assert (r["concordant"], r["discordant"]) == (2.0, 2.0)
    assert (r["ties_x"], r["ties_y"]) == (1.0, 1.0)
    assert r["tau_b"] == pytest.approx(0.0)


def test_permutation_test_separated_groups_small_p(spark):
    from arrow_spark.operators.stats_tests import permutation_test_hash

    # perfectly separated groups: observed stat is near the maximum any
    # coin-flip relabeling can reach, so p must be small
    rows = [(i, 10, 0) for i in range(40)] + [(i + 100, 1000, 1) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long, g long")
    r = permutation_test_hash(df, "k", "v", "g", n_perms=32).collect()[0]
    assert r["n"] == 80
    assert r["stat_obs"] == pytest.approx(990.0)
    assert r["b_valid"] == 32 and r["cnt_ge"] == 0
    assert r["p_value"] == pytest.approx(1.0 / 33.0)


def test_permutation_test_identical_groups_large_p(spark):
    from arrow_spark.operators.stats_tests import permutation_test_hash

    # all values equal: every permutation stat is exactly 0 == stat_obs
    rows = [(i, 5, i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, v long, g long")
    r = permutation_test_hash(df, "k", "v", "g", n_perms=16).collect()[0]
    assert r["stat_obs"] == pytest.approx(0.0)
    assert r["cnt_ge"] == r["b_valid"]
    assert r["p_value"] == pytest.approx(1.0)


def test_permutation_test_degenerate_observed_labeling_null_p(spark):
    from arrow_spark.operators.stats_tests import permutation_test_hash

    # observed labeling has ONE group: stat_obs is undefined, so p_value
    # must be NULL — not a spuriously significant 1/(B_valid+1)
    rows = [(i, i * 3, 0) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v long, g long")
    r = permutation_test_hash(df, "k", "v", "g", n_perms=16).collect()[0]
    assert r["stat_obs"] is None
    assert r["p_value"] is None
    assert r["cnt_ge"] == 0


def test_runs_test_alternating_and_blocked(spark):
    from arrow_spark.operators.stats_tests import runs_test

    # perfectly alternating around the median: runs = n (max), z > 0
    alt = spark.createDataFrame(
        [(t, 10 if t % 2 == 0 else 20) for t in range(20)], "t long, v long"
    )
    r = runs_test(alt, "t", "v").collect()[0]
    # med2 = 30; sign = v*2 > 30 -> above for 20s
    assert (r["n"], r["n_above"], r["n_below"]) == (20, 10, 10)
    assert r["runs"] == 20
    assert r["z"] > 3.0

    # two solid blocks: runs = 2 (min), z < 0
    blocks = spark.createDataFrame(
        [(t, 10) for t in range(10)] + [(t + 10, 20) for t in range(10)],
        "t long, v long",
    )
    r = runs_test(blocks, "t", "v").collect()[0]
    assert r["runs"] == 2 and r["z"] < -3.0


def test_runs_test_constant_series_z_null(spark):
    from arrow_spark.operators.stats_tests import runs_test

    const = spark.createDataFrame([(t, 7) for t in range(10)], "t long, v long")
    r = runs_test(const, "t", "v").collect()[0]
    assert r["n_above"] == 0 and r["z"] is None


def test_friedman_perfect_ordering_hand_truth(spark):
    from arrow_spark.operators.stats_tests import friedman_test

    # 3 blocks, k=3, identical ordering A<B<C every block:
    # untied ranks (1,2,3) doubled -> R2 = (6,12,18), sum sq = 504,
    # chi2 = 3*504/(3*3*4) - 3*3*4 = 6 (the n=3,k=3 maximum)
    rows = []
    for t in range(3):
        rows += [(t, "A", 10 + t), (t, "B", 20 + t), (t, "C", 30 + t)]
    df = spark.createDataFrame(rows, "t long, g string, v long")
    r = friedman_test(df, "t", "g", "v").collect()[0]
    assert (r["k"], r["n_blocks"]) == (3, 3)
    assert r["sum_rank2_sq"] == pytest.approx(504.0)
    assert r["chi2"] == pytest.approx(6.0)


def test_friedman_ties_and_incomplete_blocks(spark):
    from arrow_spark.operators.stats_tests import friedman_test

    # block 0: A=B tie (doubled ranks 3,3,6); block 1: untied (2,4,6);
    # block 2 is INCOMPLETE (2 of 3 groups) and must be dropped
    rows = [
        (0, "A", 5), (0, "B", 5), (0, "C", 9),
        (1, "A", 1), (1, "B", 2), (1, "C", 3),
        (2, "A", 1), (2, "B", 2),
    ]
    df = spark.createDataFrame(rows, "t long, g string, v long")
    r = friedman_test(df, "t", "g", "v").collect()[0]
    assert (r["k"], r["n_blocks"]) == (3, 2)
    # R2: A=3+2=5, B=3+4=7, C=6+6=12 -> sum sq = 25+49+144 = 218
    assert r["sum_rank2_sq"] == pytest.approx(218.0)
    assert r["chi2"] == pytest.approx(3.0 * 218 / (2 * 3 * 4) - 3.0 * 2 * 4)
