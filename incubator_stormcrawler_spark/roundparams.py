"""Per-round derived query parameters — the anti-overfitting seed.

Every registered query used to bake fixed constants (dates, segments,
thresholds) shared verbatim with its DuckDB oracle, so a green driver row
proved the operator only AT those constants. This module derives the
constants from a committed integer seed instead: bumping ``ROUND_SEED``
re-points every parameterized query AND its oracle at a fresh operating
point, and the driver's cross-engine hash check then certifies the
parameterized operator, not one memorized tuple. Both engines read the
SAME dict (``queries()`` builds DataFrame plans from it; ``oracle_sql()``
interpolates it into SQL), so the two sides can never drift.

Derivation is md5("r{seed}|{param-name}") → integer — deterministic,
platform-independent, no RNG state. Ranges are chosen so results stay
non-empty at the driver's sf0.01 (verified per round by
tools/verify_local.py). Floating-point-valued parameters are produced as
exact DECIMAL STRINGS (e.g. "0.55") and interpolated textually into both
engines, so no binary-float drift can enter through the seed.

ROUND LOG (bump + append a line each round):
  r8: ROUND_SEED = 8 — first seeded round (flipped from the fixed
      constants that stood through r7, all rows stayed green). The r9
      flip is PRE-PROVEN: the full registry sweep was run locally at
      ROUND_SEED = 9 before r8 closed (146/146 green at sf0.01,
      re-run after the late-r8 additions — snapshot diff, shard
      MinHash overlap, HLL overlap — landed), so bumping the seed next
      round cannot surface a red row.
  r9: ROUND_SEED = 9 — second flip, pre-proven at r8 close (see above).
      The r10 flip is PRE-PROVEN the same way: the full 148-query sweep
      ran locally at ROUND_SEED = 10 before r9 closed (148/148 green at
      sf0.01, after all r9 additions — fetch_forecast,
      classifier_score, the reshaped random projection — landed).
  r10: ROUND_SEED = 10 — third flip, pre-proven at r9 close (see above;
      148/148 at sf0.01). New seeded params this round: hh_min_count
      (corpus_heavy_hitters) and zorder_tp_hi (layout_zorder_stats),
      both verified non-degenerate at sf0.01 before registration.
      The r11 flip is PRE-PROVEN: the full 152-query sweep ran locally
      at ROUND_SEED = 11 before r10 closed (152/152 green at sf0.01,
      after all r10 additions — the four new registrations included).
  r10 (restarted): the driver re-opened round 10 with fresh turns; five
      more queries registered (layout_hilbert_stats,
      layout_hilbert3_stats, graph_redirect_resolve,
      dedup_weighted_minhash, ann_ivfpq_topk) with new seeded params
      hilbert_tp_hi, hilbert3_ep_hi, redirect_cycle_base,
      wmh_max_weight, ivfpq_n_probe. The r11 flip was RE-PROVEN at the
      final HEAD: the full 157-query sweep ran at ROUND_SEED = 11
      (failures: 0 at sf0.01), so the r11 bump cannot surface a red
      row.
  r11: ROUND_SEED = 11 — fourth flip, pre-proven at r10 close (see
      above). New seeded params this round: canon_max_hops (a
      deliberately non-power-of-two redirect budget, 5..12, so the
      graph_canonicalize row certifies the exact-budget clamp) and
      canon_cycle_base, both verified non-degenerate at sf0.01 before
      registration. The r12 flip is PRE-PROVEN: the full 158-query
      sweep ran at ROUND_SEED = 12 (158/158 green at sf0.01) — and the
      FIRST attempt of that proof surfaced a real cross-engine
      landmine: seed 12's q10 quarter produced a customer revenue whose
      exact sum ends in a half cent (…’595), and round(sum(double), 2)
      rounded it to different cents in the two engines (Spark rounds
      the shortest decimal rendering, DuckDB the binary value). The
      whole money-aggregate family now sums EXACT DECIMALs and rounds
      the decimal before casting to double (relational.py `_money` /
      `_rev_exact` / `_dsum`), killing the float-summation-order class
      that had survived four seed flips on luck; the seed-12 sweep was
      re-run green after the fix.
  r12: ROUND_SEED = 12 — fifth flip, pre-proven at r11 close (see
      above; 158/158 at sf0.01 after the exact-decimal money fix —
      tpch_returned_customers, the query the first seed-12 proof
      tripped on, is an in-window canary this round). New seeded params
      this round: inc_max_hops (24..48, deliberately non-power-of-two
      so graph_redirect_incremental certifies the exact clamp on the
      incremental path too), inc_cycle_base, and the clustered-write
      scan point (ccw_source, ccw_chars_lo, ccw_chars_span) — all
      verified non-degenerate at sf0.01 before registration. The r13
      flip is PRE-PROVEN: the full 160-query sweep ran at
      ROUND_SEED = 13 (160/160 green at sf0.01, at the final r12 HEAD —
      after the _dratio ratio rewrite, the two new registrations, and
      the pointer-doubling checkpoint fix), so the r13 bump cannot
      surface a red row.
  r13: ROUND_SEED = 13 — sixth flip, pre-proven at r12 close (see
      above; 160/160 at sf0.01). No new seeded params this round — the
      r13 work delta-bounded the loop's two remaining store-sized costs
      (near-dedup banding, resolved-map writes) rather than adding
      query surface; the two harnesses whose CODE changed
      (dedup_minhash_incremental — stored-band-key path;
      graph_redirect_incremental — arithmetic lattice prior) re-certify
      in-window. The r14 flip is PRE-PROVEN: the full 160-query sweep
      ran at ROUND_SEED = 14 at the final r13 HEAD (160/160 green at
      sf0.01), so the r14 bump cannot surface a red row.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

ROUND_SEED = 13

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [f"NATION_{i}" for i in range(25)]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
COLORS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]


def seeded_int(salt: str, lo: int, hi: int, seed: int | None = None) -> int:
    """Deterministic integer in [lo, hi] from (seed, salt)."""
    s = ROUND_SEED if seed is None else seed
    h = int(hashlib.md5(f"r{s}|{salt}".encode()).hexdigest()[:8], 16)
    return lo + h % (hi - lo + 1)


def seeded_choice(salt: str, options: list, seed: int | None = None):
    return options[seeded_int(salt, 0, len(options) - 1, seed)]


def seeded_distinct(
    salt: str, options: list, n: int, seed: int | None = None
) -> list:
    """n distinct options, order-stable for a given seed."""
    pool = list(options)
    out = []
    for i in range(n):
        out.append(pool.pop(seeded_int(f"{salt}|{i}", 0, len(pool) - 1, seed)))
    return out


def seeded_date(
    salt: str, base: str, span_days: int, seed: int | None = None
) -> str:
    """'YYYY-MM-DD' in [base, base + span_days]."""
    d = date.fromisoformat(base) + timedelta(
        days=seeded_int(salt, 0, span_days, seed)
    )
    return d.isoformat()


def _quarter(salt: str, seed: int | None = None) -> tuple[str, str]:
    """A random calendar quarter inside the data's order-date range
    (1995-01 .. 2000-10): (start, start + 3 months)."""
    q = seeded_int(salt, 0, 23, seed)  # 1995Q1 .. 2000Q4
    y, m = 1995 + q // 4, 1 + 3 * (q % 4)
    y2, m2 = (y, m + 3) if m <= 9 else (y + 1, 1)
    return f"{y}-{m:02d}-01", f"{y2}-{m2:02d}-01"


def _month(salt: str, seed: int | None = None) -> tuple[str, str]:
    """A random calendar month inside 1995-01 .. 2000-12."""
    k = seeded_int(salt, 0, 71, seed)
    y, m = 1995 + k // 12, 1 + k % 12
    y2, m2 = (y, m + 1) if m < 12 else (y + 1, 1)
    return f"{y}-{m:02d}-01", f"{y2}-{m2:02d}-01"


def round_params(seed: int | None = None) -> dict[str, object]:
    """The full per-round parameter table. Keys are {query}_{param}."""
    s = ROUND_SEED if seed is None else seed
    q4 = _quarter("q4_quarter", s)
    q10 = _quarter("q10_quarter", s)
    q14 = _month("q14_month", s)
    q15 = _quarter("q15_quarter", s)
    q6_year = seeded_int("q6_year", 1995, 2000, s)
    q12_year = seeded_int("q12_year", 1995, 2000, s)
    q20_year = seeded_int("q20_year", 1995, 2000, s)
    q6_disc_lo = seeded_int("q6_disc_lo", 3, 6, s)  # cents
    q19_qlo = [
        seeded_int("q19_qlo1", 1, 10, s),
        seeded_int("q19_qlo2", 8, 18, s),
        seeded_int("q19_qlo3", 16, 26, s),
    ]
    q19_sizes = [
        seeded_int("q19_size1", 10, 20, s),
        seeded_int("q19_size2", 20, 30, s),
        seeded_int("q19_size3", 30, 40, s),
    ]
    return {
        # --- TPC-H shapes -------------------------------------------
        "q1_cutoff": seeded_date("q1_cutoff", "1997-06-01", 730, s),
        "q2_sizes": sorted(seeded_distinct("q2_sizes", range(1, 51), 3, s)),
        "q2_type": seeded_choice("q2_type", PTYPES, s),
        "q2_region": seeded_choice("q2_region", REGIONS, s),
        "q3_segment": seeded_choice("q3_segment", SEGMENTS, s),
        "q3_date": seeded_date("q3_date", "1997-01-01", 730, s),
        "q4_start": q4[0],
        "q4_end": q4[1],
        "q4_late_days": seeded_int("q4_late_days", 60, 120, s),
        "q5_regions": seeded_distinct("q5_regions", REGIONS, 2, s),
        "q6_start": f"{q6_year}-01-01",
        "q6_end": f"{q6_year + 1}-01-01",
        "q6_disc_lo": f"0.0{q6_disc_lo}",
        "q6_disc_hi": f"0.0{q6_disc_lo + 2}",
        "q6_qty": seeded_int("q6_qty", 20, 28, s),
        "q7_nations": seeded_distinct("q7_nations", NATIONS, 2, s),
        "q8_nation": seeded_choice("q8_nation", NATIONS, s),
        "q8_region": seeded_choice("q8_region", REGIONS, s),
        "q8_type": seeded_choice("q8_type", PTYPES, s),
        "q9_types": seeded_distinct("q9_types", PTYPES, 2, s),
        # "0.50".."0.70" in steps of 0.05, as an exact decimal string
        "q9_cost_frac": f"0.{5 * seeded_int('q9_cost_frac', 10, 14, s)}",
        "q10_start": q10[0],
        "q10_end": q10[1],
        "q11_nation": seeded_choice("q11_nation", NATIONS, s),
        "q12_start": f"{q12_year}-01-01",
        "q12_end": f"{q12_year + 1}-01-01",
        "q12_late_days": seeded_int("q12_late_days", 45, 90, s),
        "q13_excl_priority": seeded_choice("q13_excl_priority", PRIORITIES, s),
        "q14_start": q14[0],
        "q14_end": q14[1],
        "q15_start": q15[0],
        "q15_end": q15[1],
        "q16_excl_brand": seeded_choice("q16_excl_brand", BRANDS, s),
        "q16_excl_type": seeded_choice("q16_excl_type", PTYPES, s),
        "q16_sizes": sorted(seeded_distinct("q16_sizes", range(1, 51), 8, s)),
        "q17_brand": seeded_choice("q17_brand", BRANDS, s),
        "q17_frac": f"0.{5 * seeded_int('q17_frac', 3, 5, s):02d}",  # 0.15..0.25
        "q18_qty": seeded_int("q18_qty", 120, 200, s),
        "q19_brands": seeded_distinct("q19_brands", BRANDS, 3, s),
        "q19_qty_los": q19_qlo,
        "q19_qty_his": [lo + 20 for lo in q19_qlo],
        "q19_sizes": q19_sizes,
        "q20_color": seeded_choice("q20_color", COLORS, s),
        "q20_nation": seeded_choice("q20_nation", NATIONS, s),
        "q20_start": f"{q20_year}-01-01",
        "q20_end": f"{q20_year + 1}-01-01",
        "q21_late_days": seeded_int("q21_late_days", 45, 90, s),
        "q22_cutoff": seeded_date("q22_cutoff", "1998-01-01", 900, s),
        # --- dedup family -------------------------------------------
        # jaccard threshold as an exact decimal string; compared against
        # the ROUND(x, 4) value in both engines
        "jaccard_threshold": seeded_choice(
            "jaccard_threshold", ["0.5", "0.55", "0.6", "0.65", "0.7"], s
        ),
        "jaccard_max_df": seeded_int("jaccard_max_df", 15, 30, s),
        # est_sim has granularity 1/8 and these thresholds sit exactly ON
        # rungs (3/8, 4/8, 5/8) — safe only because k/8 is dyadic-exact in
        # doubles and both engines compare identical values; if num_hashes
        # ever changes from 8, re-pick thresholds strictly between the new
        # rungs to keep the >= comparison off attainable values
        "minhash_min_sim": seeded_choice(
            "minhash_min_sim", ["0.375", "0.5", "0.625"], s
        ),
        # banded simhash (4 x 16-bit bands) is pigeonhole-complete only
        # for hamming <= 3 — never seed past it
        "simhash_max_hamming": seeded_int("simhash_max_hamming", 1, 3, s),
        # index/batch split point of the incremental dedup fixtures
        "dedup_split": seeded_int("dedup_split", 200, 300, s),
        "bloom_m_bits": 1 << seeded_int("bloom_m_bits", 14, 16, s),
        "bloom_n_shards": seeded_int("bloom_n_shards", 3, 6, s),
        # --- corpus sketches / selection (r8 additions) -------------
        # width deliberately below the distinct-term count so collisions
        # are real and the min-over-depth actually earns its keep
        "cm_width": seeded_int("cm_width", 96, 192, s),
        "cm_top": seeded_int("cm_top", 20, 40, s),
        "dsir_target_lang": seeded_choice(
            "dsir_target_lang", ["en", "de", "es", "fr", "zh"], s
        ),
        "dsir_buckets": 1 << seeded_int("dsir_buckets", 8, 10, s),
        "dsir_top_n": seeded_int("dsir_top_n", 40, 80, s),
    }


RP = round_params()
