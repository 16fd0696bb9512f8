"""Unit tests for bench.py's measurement policy (pure functions, no device).

The headline harness's statistical machinery — min-of-minima estimator with
deflated-glitch fallback, margin-aware adaptive stopping, self-certified
verdicts (VERDICT r4 #2, ADVICE r4) — is decision logic that must not
depend on chip luck to be exercised. bench.py keeps it in module-level pure
functions so these tests drive every branch on synthetic timing data.
"""

import bench


DN = bench.N_LONG - bench.N_SHORT
FPC = bench.BATCH * bench.FRAMES  # frames per call


def slopes_of(shorts, longs):
    return [(l - s) / DN for s, l in zip(shorts, longs)]


def mk(per_call, n, jitter=0.0):
    """n pairs at a given per-call seconds; jitter adds additive noise to
    the LONG chains only (so per-pair slopes actually spread)."""
    shorts = [bench.N_SHORT * per_call] * n
    longs = [bench.N_LONG * per_call + i * jitter for i in range(n)]
    return shorts, longs, slopes_of(shorts, longs)


class TestHeadlineEstimate:
    def test_clean_pairs_use_min_of_minima(self):
        shorts, longs, slopes = mk(0.025, 5, jitter=0.002)
        per_call, est = bench.headline_estimate(shorts, longs, slopes, DN)
        assert est == "min-of-minima"
        assert abs(per_call - 0.025) < 1e-12

    def test_inflated_outlier_rejected_by_min(self):
        shorts, longs, slopes = mk(0.025, 5)
        longs[2] += 1.5  # one GC/tunnel-stalled long chain
        slopes = slopes_of(shorts, longs)
        per_call, est = bench.headline_estimate(shorts, longs, slopes, DN)
        assert est == "min-of-minima"
        assert abs(per_call - 0.025) < 1e-12

    def test_deflated_glitch_falls_back_to_median(self):
        # one long chain "finished" impossibly early: cross-pair min picks
        # it, landing >20% below the median slope -> median fallback
        shorts, longs, slopes = mk(0.025, 5)
        longs[1] -= 0.20
        slopes = slopes_of(shorts, longs)
        per_call, est = bench.headline_estimate(shorts, longs, slopes, DN)
        assert est == "median (min deflated)"
        assert abs(per_call - 0.025) < 1e-9  # median is the clean value


class TestVerdict:
    def test_above_certified(self):
        assert bench.verdict_of(5100.0, 0.005) == "above"  # 2% margin > 0.5%

    def test_below_certified(self):
        assert bench.verdict_of(4900.0, 0.005) == "below"

    def test_margin_thinner_than_spread_is_ambiguous(self):
        # the r4 failure mode: +0.61% margin, 1.58% spread
        assert bench.verdict_of(5030.0, 0.0158) == "ambiguous"

    def test_exact_line_is_ambiguous(self):
        assert bench.verdict_of(5000.0, 0.0001) == "ambiguous"


class TestStopRule:
    def per_call_for(self, fps):
        return FPC / fps

    def test_always_collects_initial_pairs(self):
        shorts, longs, slopes = mk(self.per_call_for(6000.0), 2)
        assert bench.should_collect_more(
            bench.INIT_PAIRS - 1, shorts, longs, slopes, DN, FPC)

    def test_stops_when_spread_under_margin_above_line(self):
        # 20% above the line, zero spread: margin certifiable, stop
        shorts, longs, slopes = mk(self.per_call_for(6000.0), 8)
        assert not bench.should_collect_more(
            bench.INIT_PAIRS, shorts, longs, slopes, DN, FPC)

    def test_thin_margin_keeps_collecting(self):
        # 0.1% above the line with a 1% fast-cluster spread: not certified
        per_call = self.per_call_for(5005.0)
        shorts, longs, slopes = mk(per_call, 8, jitter=per_call * 0.01)
        assert bench.should_collect_more(
            bench.INIT_PAIRS, shorts, longs, slopes, DN, FPC)

    def test_below_line_requires_full_budget(self):
        # clearly below with ZERO spread: min-of-N is monotone, so a red
        # call still must exhaust MAX_PAIRS
        shorts, longs, slopes = mk(self.per_call_for(4500.0), 10)
        assert bench.should_collect_more(
            bench.MAX_PAIRS - 1, shorts, longs, slopes, DN, FPC)
        assert not bench.should_collect_more(
            bench.MAX_PAIRS, shorts, longs, slopes, DN, FPC)

    def test_glitch_only_history_keeps_collecting(self):
        assert bench.should_collect_more(
            bench.INIT_PAIRS, [1.0], [3.0], [0.2], DN, FPC)
