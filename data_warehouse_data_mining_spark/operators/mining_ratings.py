"""Pairwise-comparison rating models split from mining_policy.py (r11
size hygiene): Bradley-Terry MM strengths (batch) and the Elo replay
(online) over the same daily revenue duels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_warehouse_data_mining_spark.catalog import load
from data_warehouse_data_mining_spark.registry import register

BT_ITERS = 8
BT_UNIT = 1_000_000_000_000


def _bt_oracle() -> str:
    steps = []
    prev = "p0"
    for t in range(1, BT_ITERS + 1):
        steps.append(f"""d{t} AS MATERIALIZED (
      SELECT s.i,
             CAST(sum(CAST(floor((CAST(m.n AS DOUBLE) * {BT_UNIT})
                                 * {BT_UNIT} / (s.p + p2.p) + 0.001)
                           AS BIGINT)) AS BIGINT) AS d
      FROM sym m
      JOIN {prev} s ON s.i = m.i
      JOIN {prev} p2 ON p2.i = m.j
      GROUP BY s.i
    ),
    r{t} AS MATERIALIZED (
      SELECT w.i,
             CAST(floor((CAST(w.w AS DOUBLE) * {BT_UNIT}) * {BT_UNIT}
                        / greatest(d{t}.d, 1) + 0.001) AS BIGINT) AS praw
      FROM w JOIN d{t} ON d{t}.i = w.i
    ),
    p{t} AS MATERIALIZED (
      SELECT i,
             CAST(floor((CAST(praw AS DOUBLE) * {BT_UNIT})
                        / (SELECT sum(praw) FROM r{t}) + 0.001)
                  AS BIGINT) AS p
      FROM r{t}
    )""")
        prev = f"p{t}"
    unrolled = ",\n    ".join(steps)
    return f"""
    WITH cells AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type AS i,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM events GROUP BY 1, 2
    ),
    duels AS (
      SELECT a.i AS wi, b.i AS li
      FROM cells a JOIN cells b
        ON b.day = a.day AND a.i <> b.i AND a.rev > b.rev
    ),
    wins AS (
      SELECT wi, li, CAST(count(*) AS BIGINT) AS nw
      FROM duels GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT a.wi AS i, a.li AS j,
             a.nw + coalesce(b.nw, 0) AS n
      FROM wins a LEFT JOIN wins b ON b.wi = a.li AND b.li = a.wi
      UNION
      SELECT a.li, a.wi, a.nw + coalesce(b.nw, 0)
      FROM wins a LEFT JOIN wins b ON b.wi = a.li AND b.li = a.wi
    ),
    w AS MATERIALIZED (
      SELECT wi AS i, CAST(sum(nw) AS BIGINT) AS w FROM wins GROUP BY 1
    ),
    p0 AS (SELECT i, CAST({BT_UNIT} // 5 AS BIGINT) AS p FROM w),
    {unrolled}
    SELECT w.i AS event_type, w.w AS n_wins,
           (SELECT CAST(sum(n) AS BIGINT) FROM sym s WHERE s.i = w.i)
             AS n_contests,
           p.p AS strength_units,
           round(p.p / {BT_UNIT}.0, 6) AS bt_strength
    FROM w JOIN p{BT_ITERS} p ON p.i = w.i
    ORDER BY p.p DESC, w.i
    """


@register("bradley_terry_event_strengths", oracle=_bt_oracle())
def bradley_terry_event_strengths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bradley-Terry paired-comparison strengths (Bradley & Terry
    1952) of the five event types, learned from daily revenue duels
    (type i beats type j on a day when its daily revenue is strictly
    higher): {BT_ITERS} Hunter-(2004)-MM iterations p_i <- W_i /
    sum_j n_ij/(p_i+p_j), renormalized each step — ranking from
    pairwise outcomes, the model behind chess Elo aggregates, match-up
    analysis and LLM preference leaderboards; complements
    ucb1_bandit_replay (which LEARNS while playing — this RATES after
    the fact).

    Determinism: the duel counts are exact integers; each MM step runs
    in {BT_UNIT} fixed-point units with every division spelled as the
    SAME double expression in both engines behind the
    floor(x + 1e-3) guard (the n*U^2 numerators exceed BIGINT, and
    identical-input correctly-rounded double ops floor to identical
    integers), so all {BT_ITERS} iterations are bit-identical walks of
    a 5-row state table — Spark runs them inside one applyInPandas
    task (bounded model state, the elo discipline), the oracle unrolls
    materialized CTEs.

    Scale: one fact scan -> (day, type) hash agg; duels, wins and all
    iterations run on calendar x 5-type bounded tables."""
    e = load(spark, sf_dir).events
    cells = (
        e.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.col("event_type").alias("i"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # calendar x 5 table, read twice
    )
    b = cells.select(
        F.col("day").alias("day2"),
        F.col("i").alias("j"),
        F.col("rev").alias("rev2"),
    )
    wins = (
        cells.join(
            b,
            (F.col("day") == F.col("day2"))
            & (F.col("i") != F.col("j"))
            & (F.col("rev") > F.col("rev2")),
        )
        .groupBy(F.col("i").alias("wi"), F.col("j").alias("li"))
        .agg(F.count(F.lit(1)).cast("long").alias("nw"))
        .localCheckpoint(eager=True)
    )
    back = wins.select(
        F.col("wi").alias("bwi"), F.col("li").alias("bli"),
        F.col("nw").alias("bnw"),
    )
    sym = (
        wins.join(
            back,
            (F.col("bwi") == F.col("li")) & (F.col("bli") == F.col("wi")),
            "left",
        )
        .select(
            F.col("wi").alias("i"),
            F.col("li").alias("j"),
            (F.col("nw") + F.coalesce(F.col("bnw"), F.lit(0))).alias("n"),
        )
        .unionAll(
            wins.join(
                back,
                (F.col("bwi") == F.col("li"))
                & (F.col("bli") == F.col("wi")),
                "left",
            ).select(
                F.col("li").alias("i"),
                F.col("wi").alias("j"),
                (F.col("nw") + F.coalesce(F.col("bnw"), F.lit(0))).alias(
                    "n"
                ),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    w = wins.groupBy(F.col("wi").alias("i")).agg(
        F.sum("nw").cast("long").alias("w")
    ).localCheckpoint(eager=True)

    # The {BT_ITERS} MM iterations run INSIDE one applyInPandas task
    # (r14, guide §1.2; the elo_rating_replay single-bounded-group
    # discipline): the MM recurrence walks a ≤5-row state table over a
    # ≤5×4-row symmetric duel-count table — literal-bounded model
    # state, never data-sized — and the former DataFrame loop paid
    # 8 × (2 joins + groupBy + crossJoin + EAGER localCheckpoint) in
    # stage scheduling (~4-5 s warm at sf0.01 on 25 rows). Arithmetic
    # is the identical double expression sequence behind the same
    # floor(x + 1e-3) guards: CPython floats are IEEE doubles, int →
    # double conversion is round-to-nearest exactly like the JVM's
    # long → double promotion, and both evaluate the same
    # left-associative chain, so every iteration floors to the same
    # integers (oracle hash equality at three SFs is the proof).
    import math

    import pandas as pd

    def mm_iterate(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sym_rows = list(zip(pdf["i"], pdf["j"], (int(x) for x in pdf["n"])))
        wmap = {i: int(wi) for i, wi in zip(pdf["i"], pdf["w"])}
        state = {i: BT_UNIT // 5 for i in wmap}
        for _ in range(BT_ITERS):
            d: dict[str, int] = {}
            for i, j, n in sym_rows:
                if i in state and j in state:
                    term = math.floor(
                        float(n) * BT_UNIT * BT_UNIT / (state[i] + state[j])
                        + 0.001
                    )
                    d[i] = d.get(i, 0) + term
            praw = {
                i: math.floor(
                    float(wmap[i]) * BT_UNIT * BT_UNIT / max(d[i], 1) + 0.001
                )
                for i in wmap
                if i in d
            }
            s = sum(praw.values())
            state = {
                i: math.floor(float(p) * BT_UNIT / s + 0.001)
                for i, p in praw.items()
            }
        keys = sorted(state)
        return pd.DataFrame({"i": keys, "p": [state[k] for k in keys]})

    state = (
        sym.join(w, "i")
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(mm_iterate, "i string, p long")
    )
    contests = sym.groupBy("i").agg(F.sum("n").cast("long").alias("n_contests"))
    return (
        w.join(state, "i")
        .join(contests, "i")
        .select(
            F.col("i").alias("event_type"),
            F.col("w").alias("n_wins"),
            "n_contests",
            F.col("p").alias("strength_units"),
            F.round(F.col("p") / float(BT_UNIT), 6).alias("bt_strength"),
        )
        .orderBy(F.col("strength_units").desc(), "event_type")
    )


ELO_K_MILLI = 16_000      # K-factor, milli-points
ELO_START_MILLI = 1_000_000  # 1000.000 start rating
_ELO_LN10 = 2.302585093   # baked ln(10)
_ELO_TYPES = ("click", "error", "purchase", "signup", "view")


def elo_expected_micro(d_milli: int) -> int:
    """E = 1/(1+10^(d/400)) for rating gap d = R_opp - R_self in
    milli-points, floored to 1e-6 fixed point; 10^x spelled
    exp(x*ln10) with ln10 a baked literal so both engines run the
    same single transcendental behind the floor guard."""
    import math

    return math.floor(
        1_000_000 / (1 + math.exp(d_milli / 400_000.0 * _ELO_LN10)) + 0.001
    )


def _elo_oracle() -> str:
    cols = ", ".join(f"r_{t}" for t in _ELO_TYPES)
    start = ", ".join(
        f"CAST({ELO_START_MILLI} AS BIGINT) AS r_{t}" for t in _ELO_TYPES
    )
    upd = []
    for t in _ELO_TYPES:
        upd.append(f"""
             CASE WHEN d.wi = '{t}' THEN w.r_{t}
                    + ({ELO_K_MILLI} * (1000000 - CAST(floor(1000000.0
                      / (1 + exp((CASE {' '.join(f"WHEN d.li = '{u}' THEN w.r_{u}" for u in _ELO_TYPES)} END
                         - w.r_{t}) / 400000.0 * {_ELO_LN10})) + 0.001)
                      AS BIGINT))) // 1000000
                  WHEN d.li = '{t}' THEN w.r_{t}
                    - ({ELO_K_MILLI} * CAST(floor(1000000.0
                      / (1 + exp(((CASE {' '.join(f"WHEN d.wi = '{u}' THEN w.r_{u}" for u in _ELO_TYPES)} END)
                         - w.r_{t}) / 400000.0 * {_ELO_LN10})) + 0.001)
                      AS BIGINT)) // 1000000
                  ELSE w.r_{t} END AS r_{t}""")
    updates = ",".join(upd)
    return f"""
    WITH RECURSIVE cells AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type AS i,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev
      FROM events GROUP BY 1, 2
    ),
    duel_seq AS (
      SELECT row_number() OVER (ORDER BY a.day, a.i, b.i) AS rn,
             a.i AS wi, b.i AS li
      FROM cells a JOIN cells b
        ON b.day = a.day AND a.i <> b.i AND a.rev > b.rev
    ),
    nmax AS (SELECT CAST(max(rn) AS BIGINT) AS n FROM duel_seq),
    walk(rn, {cols}) AS (
      SELECT CAST(0 AS BIGINT), {start}
      UNION ALL
      SELECT w.rn + 1,{updates}
      FROM walk w JOIN duel_seq d ON d.rn = w.rn + 1
    ),
    final AS (
      SELECT * FROM walk CROSS JOIN nmax WHERE walk.rn = nmax.n
    ),
    duels_per AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n_duels FROM (
        SELECT wi AS i FROM duel_seq UNION ALL SELECT li FROM duel_seq
      ) GROUP BY i
    )
    SELECT u.i AS event_type,
           COALESCE(d.n_duels, CAST(0 AS BIGINT)) AS n_duels,
           CAST(u.r AS BIGINT) AS elo_milli,
           round(u.r / 1000.0, 3) AS elo_rating
    FROM (
      {' UNION ALL '.join(f"SELECT '{t}' AS i, r_{t} AS r FROM final" for t in _ELO_TYPES)}
    ) u LEFT JOIN duels_per d ON d.i = u.i
    ORDER BY u.r DESC, u.i
    """


@register("elo_rating_replay", oracle=_elo_oracle())
def elo_rating_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elo rating replay (Elo 1978) over the time-ordered daily
    revenue duels between the five event types: K=16, start 1000,
    expected score E = 1/(1+10^(gap/400)) — the ONLINE sequential
    rating whose batch/stationary counterpart is
    bradley_terry_event_strengths (Elo is stochastic-gradient BT; the
    final orderings should broadly agree, pinned in tests).

    Determinism: ratings walk in integer milli-points; each duel's
    expected score is ONE exp (10^x spelled exp(x*ln10), ln10 baked)
    floored to 1e-6 before the integer K-update, so the ~600-step
    walk is bit-identical in both engines (the ucb1/msprt guard
    discipline); duels are totally ordered by (day, winner, loser).

    Scale: one fact scan -> (day, type) agg; the duel sequence is
    calendar x 10-pairs bounded, walked stateful-per-key in
    applyInPandas (single bounded group — the rating state is 5
    numbers, never data-sized)."""
    e = load(spark, sf_dir).events
    cells = (
        e.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.col("event_type").alias("i"),
        )
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    b = cells.select(
        F.col("day").alias("day2"),
        F.col("i").alias("j"),
        F.col("rev").alias("rev2"),
    )
    duels = (
        cells.join(
            b,
            (F.col("day") == F.col("day2"))
            & (F.col("i") != F.col("j"))
            & (F.col("rev") > F.col("rev2")),
        )
        .select("day", F.col("i").alias("wi"), F.col("j").alias("li"))
    )

    import pandas as pd

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["day", "wi", "li"])
        r = {t: ELO_START_MILLI for t in _ELO_TYPES}
        nd = {t: 0 for t in _ELO_TYPES}
        for wi, li in zip(pdf["wi"], pdf["li"]):
            ew = elo_expected_micro(r[li] - r[wi])
            el = elo_expected_micro(r[wi] - r[li])
            # winner gains K(1 - E_w); loser loses K*E_l (score 0) —
            # with E_w + E_l = 1 the exchange is zero-sum up to floors
            r[wi] += ELO_K_MILLI * (1_000_000 - ew) // 1_000_000
            r[li] -= ELO_K_MILLI * el // 1_000_000
            nd[wi] += 1
            nd[li] += 1
        return pd.DataFrame(
            {
                "event_type": list(_ELO_TYPES),
                "n_duels": [nd[t] for t in _ELO_TYPES],
                "elo_milli": [r[t] for t in _ELO_TYPES],
                "elo_rating": [round(r[t] / 1000.0, 3) for t in _ELO_TYPES],
            }
        )

    return (
        duels.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            walk,
            schema=(
                "event_type string, n_duels long, elo_milli long,"
                " elo_rating double"
            ),
        )
        .orderBy(F.col("elo_milli").desc(), "event_type")
    )
