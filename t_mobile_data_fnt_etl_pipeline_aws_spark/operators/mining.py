"""Pattern-mining operators: association rules, Markov transitions,
collocation (PMI), and inverted-index construction.

Reference parity: the reference snapshot publishes no code
(/root/reference/README.md:1-2); these are the co-occurrence /
sequence-mining capstones a warehouse analytics engine exposes over the
same orders/lineitem/part/events/documents tables as the rest of the
registry.

Scale notes shared by the module: the pair spaces here are bounded by
DICTIONARY size, not data size — brand×brand (≤ 25²), type×type (≤ 5²),
vocab×vocab (fixture vocabulary) — so the heavy steps are linear
explode/groupBy shuffles with map-side combine, and every per-entity
dimension (brand counts, unigram counts, totals) re-enters as a
broadcast join. Probabilities are exact-integer quotients (identical
IEEE doubles in both engines); only ln() is finished (numeric.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import finish, sql_finish_dbl
from ..registry import query
from ..sources.tables import load

#: minimum co-occurrence count for an association pair to be reported.
_MIN_PAIR = 10

#: minimum bigram count for a PMI collocation to be reported.
_MIN_BIGRAM = 5


@query(
    "q_assoc_market_basket",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_ord AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    brand_n AS (SELECT p_brand, count(*) AS n FROM items GROUP BY p_brand),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab,
           cast(n_ab AS double) / cast(n_orders AS double) AS support,
           cast(n_ab AS double) / cast(na.n AS double) AS confidence,
           (cast(n_ab AS double) * cast(n_orders AS double))
               / (cast(na.n AS double) * cast(nb.n AS double)) AS lift
    FROM pairs
    JOIN brand_n na ON pairs.brand_a = na.p_brand
    JOIN brand_n nb ON pairs.brand_b = nb.p_brand
    CROSS JOIN n_ord
    WHERE n_ab >= {_MIN_PAIR}
    """,
)
def q_assoc_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the brand grain: for every
    co-purchased brand pair, support, confidence(A→B), and lift.

    Basket building is a broadcast dim join (part is the dimension) +
    one distinct; the pair space is the ORDER-key self-join, whose
    per-order fan-out is |basket|² with baskets bounded by order line
    counts (≤ 7 in TPC-H shape) — never a brand×brand cross join over
    data. Brand marginals (≤ 25 rows) and the order total (1 row)
    re-enter as broadcasts. The min-support gate (n_ab ≥ 10) is the
    standard a-priori prune: at 100 TB it moves BEFORE pairing (drop
    infrequent brands first), which only shrinks this plan. Support /
    confidence / lift are quotients of exact integers — bit-identical
    doubles in both engines, deliberately unfinished (numeric.py rule 5).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Round-15 note (guide §1 — measure, then keep or revert): `items`
    # backs 5 references with no ReusedExchange, but materializing it
    # was MEASURED SLOWER (1.73 → 3.22 s at sf0.1): the intermediate is
    # ~0.5M rows, so serializing it costs more than the replayed
    # broadcast-join recomputes it feeds. Left as recompute — the
    # checkpoint trick pays only for small decision tables.
    items = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_ord = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    brand_n = items.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a = items.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = items.select(
        F.col("l_orderkey").alias("rk"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, (a["l_orderkey"] == b["rk"]) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _MIN_PAIR)
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n_ord))
    )
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "brand_a",
        "brand_b",
        "n_ab",
        (fd("n_ab") / fd("n_orders")).alias("support"),
        (fd("n_ab") / fd("n_a")).alias("confidence"),
        ((fd("n_ab") * fd("n_orders")) / (fd("n_a") * fd("n_b"))).alias("lift"),
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           cast(n_transitions AS double)
               / cast(sum(n_transitions) OVER (PARTITION BY from_type) AS double)
               AS prob
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next action | action), the model behind next-step prediction and
    anomalous-flow detection.

    One window (lead over the per-user stream, keyed and tie-broken on
    (ts, event_id) — the sessionization ordering contract) + one
    groupBy; row probabilities normalize over the AGGREGATED transition
    table (≤ |event types|² rows), so the normalizing window is bounded
    regardless of SF. Probabilities are exact-integer quotients, never
    finished.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double") / row_tot.cast("double")
        ).alias("prob"),
    )


@query(
    "q_text_pmi_bigrams",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    uni AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
    n_tok AS (SELECT cast(sum(c) AS bigint) AS nt FROM uni),
    bg AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1]
               )) AS b
        FROM documents
    ),
    bgc AS (
        SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
               count(*) AS n_ab
        FROM bg GROUP BY 1, 2
        HAVING count(*) >= {_MIN_BIGRAM}
    ),
    n_bg AS (SELECT cast(count(*) AS bigint) AS nb FROM bg)
    SELECT w1, w2, n_ab,
           {sql_finish_dbl(
               "ln((cast(n_ab as double) / cast(ua.c as double))"
               " * (cast(nt as double) / cast(ub.c as double))"
               " * (cast(nt as double) / cast(nb as double)))", 6
           )} AS pmi
    FROM bgc
    JOIN uni ua ON bgc.w1 = ua.w
    JOIN uni ub ON bgc.w2 = ub.w
    CROSS JOIN n_tok CROSS JOIN n_bg
    """,
)
def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation detector ("strongly associated word pairs") behind
    phrase mining and tokenizer-merge scoring.

    PMI = ln(p(ab) / (p(a)p(b))) computed as a product of three
    exact-integer quotients (each bit-identical across engines; the
    grouped products would overflow 2^53 at large SF if multiplied out
    as integers), with only the final ln finished at 6 dp. Bigrams come
    from the shingle slice/zip construction (k = 2) — NOT per-index
    element_at, which Catalyst re-splits per element (SURVEY rule 5);
    the w1/w2 split runs on the aggregated bigram table, whose size is
    bounded by vocabulary², not corpus size. Unigram counts and the two
    totals re-enter as broadcasts.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n2 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n2),
        F.slice(toks, 2, n2),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    uni = (
        d.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("bigint").alias("nt"))
    bg = d.select(F.explode(bigrams).alias("b"))
    n_bg = bg.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    bgc = (
        bg.groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _MIN_BIGRAM)
        .select(
            F.element_at(F.split(F.col("b"), " "), 1).alias("w1"),
            F.element_at(F.split(F.col("b"), " "), 2).alias("w2"),
            "n_ab",
        )
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    out = (
        bgc.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bg))
    )
    fd = lambda c: F.col(c).cast("double")  # noqa: E731
    ratio = (
        (fd("n_ab") / fd("c_a"))
        * (fd("nt") / fd("c_b"))
        * (fd("nt") / fd("nb"))
    )
    return out.select("w1", "w2", "n_ab", finish(F.log(ratio), 6).alias("pmi"))


@query(
    "q_text_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 200
    )
    SELECT token,
           count(*) AS df,
           min(doc_id) AS first_doc,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tok WHERE token <> ''
    GROUP BY token
    """,
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → document frequency + sorted
    posting list — the retrieval-side artifact a corpus engine emits
    next to the forward table (and the backbone of the prefix-filter
    dedup family's candidate generation).

    One explode + distinct + groupBy(token) shuffle; posting lists are
    sort_array'd so output is partition-order independent, and emitted
    as comma-joined strings (ArrayType cells are unhashable in the
    driver's canonicalizer — the q_agg_collect_sorted lesson). Bounded
    to the doc_id < 200 slice here so list lengths stay print-sane; at
    scale the posting list per token is the real product and the plan
    is unchanged (skew on stopword tokens → the standard df-cap /
    split-posting mitigation, which the df column enables).
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.min("doc_id").alias("first_doc"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )
