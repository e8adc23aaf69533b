"""Property-based tests (hypothesis) for the shared algorithmic cores.

The fixture-driven mirror proves each registered query on ONE data
shape; these batter the two reusable engines — the prefix-filter
set-similarity join (now the candidate machinery behind four dedup
operators and CC edge generation) and alternating-star connected
components — with randomized adversarial inputs, comparing against
brute-force Python implementations. A failure here is an algorithmic
defect no fixture rerun would catch.
"""

from __future__ import annotations

import pytest


def _brute_jaccard_pairs(docs: dict[int, set], num: int, den: int):
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not docs[a] and not docs[b]:
                continue
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            j = inter / union
            if j >= num / den:
                out[(a, b)] = j
    return out


def test_prefix_filter_matches_bruteforce_random_corpora(spark):
    """prefix_filter_jaccard_pairs must emit EXACTLY the brute-force
    pair set (no false negatives from the prefix bound, none from the
    size-ratio prune) with identical Jaccard values, across random
    corpora and thresholds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from t_mobile_data_fnt_etl_pipeline_aws_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    tokens = st.sets(st.sampled_from(list("abcdefghij")), max_size=8)
    corpus = st.lists(tokens, min_size=2, max_size=10)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=corpus, tau=st.sampled_from([(1, 2), (3, 10), (4, 5), (2, 3)]))
    def run(docs, tau):
        num, den = tau
        doc_map = {i: s for i, s in enumerate(docs)}
        rows = [
            (i, t) for i, s in doc_map.items() for t in s
        ]
        if not rows:
            return
        tok = spark.createDataFrame(rows, ["doc_id", "token"])
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(tok, num, den).collect()
        }
        want = _brute_jaccard_pairs(doc_map, num, den)
        assert set(got) == set(want), (got, want, doc_map)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12

    run()


def test_containment_filter_matches_bruteforce_random_corpora(spark):
    """prefix_filter_containment_pairs must emit exactly the ordered
    brute-force containment pairs (C = |A∩B|/|A| ≥ τ), including the
    asymmetric subset cases the symmetric join can't represent."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from t_mobile_data_fnt_etl_pipeline_aws_spark.operators.dedup import (
        prefix_filter_containment_pairs,
    )

    tokens = st.sets(st.sampled_from(list("abcdefgh")), max_size=6)
    corpus = st.lists(tokens, min_size=2, max_size=8)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=corpus, tau=st.sampled_from([(3, 5), (1, 2), (4, 5)]))
    def run(docs, tau):
        num, den = tau
        doc_map = {i: s for i, s in enumerate(docs)}
        rows = [(i, t) for i, s in doc_map.items() for t in s]
        if not rows:
            return
        tok = spark.createDataFrame(rows, ["doc_id", "token"])
        got = {
            (r.doc_sub, r.doc_super): r.containment
            for r in prefix_filter_containment_pairs(tok, num, den).collect()
        }
        want = {}
        for a, sa in doc_map.items():
            if not sa:
                continue
            for b, sb in doc_map.items():
                if a == b:
                    continue
                c = len(sa & sb) / len(sa)
                if c >= num / den:
                    want[(a, b)] = c
        assert set(got) == set(want), (got, want, doc_map)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12

    run()


def _union_find_components(nodes, edges):
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp = {}
    for v in nodes:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_alternating_cc_matches_union_find(spark):
    """alternating_cc must label every node with its component's minimum
    id — identical to a sequential union-find — on random graphs
    (including self-loops, duplicate and reversed edges, isolated
    nodes)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from t_mobile_data_fnt_etl_pipeline_aws_spark.operators.clustering import (
        alternating_cc,
    )

    node_ids = st.integers(min_value=0, max_value=12)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.lists(st.tuples(node_ids, node_ids), max_size=20))
    def run(edges):
        nodes = sorted(set(range(13)))
        nodes_df = spark.createDataFrame(
            [(v,) for v in nodes], ["doc_id"]
        )
        if edges:
            edges_df = spark.createDataFrame(edges, ["src", "dst"])
        else:
            edges_df = nodes_df.select(
                nodes_df.doc_id.alias("src"), nodes_df.doc_id.alias("dst")
            ).limit(0)
        labels, rounds = alternating_cc(nodes_df, edges_df)
        got = {r.doc_id: r.cluster_id for r in labels.collect()}
        want = _union_find_components(nodes, edges)
        assert got == want, (got, want, edges)
        assert rounds <= 10

    run()


def test_equidepth_ntile_arithmetic_matches_duckdb():
    """The NTILE bucket formula q_profile_histogram_equidepth computes
    from (rank, n) — first n mod k buckets get ceil(n/k) rows — must
    match DuckDB's native ntile for EVERY population size, not just
    the fixture's; checked exhaustively for n in 10..400 at k=10 via
    one set-based DuckDB query per n."""
    import duckdb

    con = duckdb.connect()
    for n in list(range(10, 60)) + [97, 100, 123, 250, 399, 400]:
        rows = con.execute(
            f"""
            WITH r AS (SELECT unnest(generate_series(1, {n})) AS rnk),
            duck AS (
                SELECT rnk, ntile(10) OVER (ORDER BY rnk) AS b FROM r
            ),
            mine AS (
                SELECT rnk,
                       CASE WHEN rnk <= ({n} % 10) * ({n} // 10 + 1)
                            THEN (rnk - 1) // ({n} // 10 + 1) + 1
                            ELSE {n} % 10
                                 + (rnk - ({n} % 10) * ({n} // 10 + 1) - 1)
                                   // ({n} // 10) + 1
                       END AS b
                FROM r
            )
            SELECT count(*) FROM duck JOIN mine USING (rnk)
            WHERE duck.b <> mine.b
            """
        ).fetchone()[0]
        assert rows == 0, f"ntile formula diverges from DuckDB at n={n}"
    con.close()


def test_polymorphic_udtf_schema_follows_argument(spark, sf_dir):
    """The SAME registered UDTF must plan different output schemas for
    different constant n (analyze-time polymorphism), and reject a
    non-constant n with the analyze-time error, not a runtime crash."""
    from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import all_queries

    all_queries()["q_udtf_polymorphic"](spark, sf_dir)  # registers + view
    two = spark.sql(
        "SELECT s.* FROM udtf_poly_docs, LATERAL first_tokens(doc_id, text, 2) s"
    )
    assert two.columns == ["doc_id", "tok_1", "tok_2"]
    six = spark.sql(
        "SELECT s.* FROM udtf_poly_docs, LATERAL first_tokens(doc_id, text, 6) s"
    )
    assert six.columns == ["doc_id"] + [f"tok_{i}" for i in range(1, 7)]
    import pytest as _pytest

    with _pytest.raises(Exception, match="constant"):
        spark.sql(
            "SELECT s.* FROM udtf_poly_docs, "
            "LATERAL first_tokens(doc_id, text, cast(doc_id as int)) s"
        ).collect()


def test_bpe_replace_chain_equals_scan_merge_property():
    """The load-bearing claim behind q_bpe_apply (and the
    q_bpe_train_merges fold): on the double-space symbol encoding,
    literal replace(' l  r ', ' lr ') — left-to-right, non-overlapping,
    never rescanning replaced output, the shared semantics of Spark's
    replace(), DuckDB's replace(), and Python's str.replace — equals
    the textbook leftmost BPE merge scan, for EVERY word and every
    realistic merge sequence. Hypothesis drives a tiny alphabet (so
    overlap-heavy cases like merging (a,a) over 'aaaa' are dense) and
    REALISTIC merge lists: each round's pair is drawn from pairs
    actually adjacent in the current vocab, exactly how trained merge
    tables arise (including self-pairs and merged-symbol chaining)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def scan_merge(syms, left, right):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def encode(word):
        return "".join(f" {c} " for c in list(word) + ["</w>"])

    @settings(max_examples=300, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        ),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(words, seed):
        import random

        rng = random.Random(seed)
        vocab = {w: list(w) + ["</w>"] for w in words}
        encs = {w: encode(w) for w in words}
        for _ in range(6):
            pairs = sorted(
                {
                    (s[i], s[i + 1])
                    for s in vocab.values()
                    for i in range(len(s) - 1)
                }
            )
            if not pairs:
                break
            left, right = rng.choice(pairs)
            vocab = {w: scan_merge(s, left, right) for w, s in vocab.items()}
            encs = {
                w: e.replace(f" {left}  {right} ", f" {left}{right} ")
                for w, e in encs.items()
            }
            for w in words:
                got = encs[w].split("  ")
                got = [t.strip(" ") for t in got]
                assert got == vocab[w], (w, left, right, encs[w], vocab[w])
                # the token-count arithmetic q_bpe_apply relies on
                n_spaces = len(encs[w]) - len(encs[w].replace(" ", ""))
                assert n_spaces == 2 * len(vocab[w])

    check()


def test_manifest_table_random_commit_sequences(spark):
    """Model-based property test for sources/manifest_table.py: across
    random append/replace sequences, every historical version must read
    back EXACTLY its model row-set (time travel is total), the
    version-diff change feed must equal the delta for appends and the
    rewritten set for replaces, and vacuum(retain_last=1) must preserve
    the current version while expiring everything older."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from t_mobile_data_fnt_etl_pipeline_aws_spark.sources.manifest_table import (
        commit_append,
        commit_replace,
        current_version,
        diff_files,
        read_version,
        vacuum,
    )

    # an op is ("append", row_ids) or ("replace",) — replace compacts
    # the current live set; row ids are globally unique per sequence
    ops = st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(1, 4)),
            st.tuples(st.just("replace")),
        ),
        min_size=1,
        max_size=4,
    )

    counter = [0]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(seq=ops)
    def run(seq):
        if seq[0][0] == "replace":  # replace needs a live set
            seq = [("append", 2)] + seq
        table = tempfile.mkdtemp(prefix="mt_prop_")
        shutil.rmtree(table)
        try:
            model = {}  # version -> frozenset of row ids
            live = set()
            deltas = {}  # version -> (op, row-id set written this commit)
            next_id = counter[0]
            for op in seq:
                if op[0] == "append":
                    ids = set(range(next_id, next_id + op[1]))
                    next_id += op[1]
                    df = spark.createDataFrame(
                        [(i, f"p{i % 3}") for i in sorted(ids)], ["k", "part"]
                    )
                    v = commit_append(df.repartition(1), table, ["k"])
                    live = live | ids
                    deltas[v] = ("append", ids)
                else:
                    df = read_version(spark, table).repartition(1)
                    v = commit_replace(df, table, ["k"])
                    deltas[v] = ("replace", set(live))
                model[v] = frozenset(live)
            counter[0] = next_id
            cur = current_version(table)
            assert cur == len(seq)
            # (1) time travel is total and exact
            for v, expect in model.items():
                got = {
                    r.k for r in read_version(spark, table, v).collect()
                }
                assert got == set(expect), (v, got, expect)
            # (2) change feed per version
            for v, (op, ids) in deltas.items():
                delta_files = diff_files(table, v - 1, v)
                got = (
                    {r.k for r in spark.read.parquet(*delta_files).collect()}
                    if delta_files
                    else set()
                )
                assert got == ids, (v, op, got, ids)
            # (3) vacuum keeps the current version, expires the rest
            vacuum(table, retain_last=1)
            got = {r.k for r in read_version(spark, table, cur).collect()}
            assert got == set(model[cur])
            logs = _glob.glob(os.path.join(table, "_log", "v*.json"))
            assert len(logs) == 1
        finally:
            shutil.rmtree(table, ignore_errors=True)

    run()


def test_manifest_table_random_delete_sequences(spark):
    """Model-based property test for the ROW-LEVEL plane: across random
    append / position-delete / equality-delete / replace / rollback
    sequences, every historical version must read back exactly its
    model VISIBLE row-set (masks included in time travel), equality
    vectors must be SEQ-SCOPED (Iceberg v2: they mask only files
    committed before them, so a value appended after its eq-delete is
    visible — the re-insert case), delete commits must add zero data
    files, compaction must fold all masks in, and rollback must
    restore the full visible state (masks and all)."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from t_mobile_data_fnt_etl_pipeline_aws_spark.sources.manifest_table import (
        commit_append,
        commit_delete,
        commit_delete_equality,
        commit_replace,
        current_version,
        diff_files,
        read_version,
        read_version_with_pos,
        rollback,
        table_stats,
    )

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(1, 4)),
            st.tuples(st.just("pos_delete"), st.integers(0, 2)),
            st.tuples(st.just("eq_delete"), st.integers(0, 3)),
            st.tuples(st.just("replace")),
            st.tuples(st.just("rollback"), st.integers(0, 5)),
        ),
        min_size=2,
        max_size=5,
    )

    counter = [0]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(seq=ops)
    def run(seq):
        seq = [("append", 3)] + seq  # deletes/replace need a live set
        table = tempfile.mkdtemp(prefix="mt_prop_del_")
        shutil.rmtree(table)
        try:
            visible = set()  # model of the VISIBLE row-set
            model = {}  # version -> frozenset visible
            no_datafile_versions = []
            next_id = counter[0]
            for op in seq:
                if op[0] == "append":
                    ids = set(range(next_id, next_id + op[1]))
                    next_id += op[1]
                    df = spark.createDataFrame(
                        [(i, i * 10) for i in sorted(ids)], ["k", "v"]
                    )
                    ver = commit_append(df.repartition(1), table, ["k"])
                    # seq scoping: eq vectors never mask later appends
                    # (values in a live vector re-appear on re-insert)
                    visible |= ids
                elif op[0] == "pos_delete":
                    doomed = read_version_with_pos(spark, table).filter(
                        f"k % 3 = {op[1]}"
                    )
                    ver = commit_delete(
                        spark, table, doomed.select("file_path", "row_index")
                    )
                    visible -= {i for i in visible if i % 3 == op[1]}
                    no_datafile_versions.append(ver)
                elif op[0] == "eq_delete":
                    vals = sorted(
                        i for i in range(next_id + 8) if i % 4 == op[1]
                    )
                    vdf = spark.createDataFrame([(i,) for i in vals], ["k"])
                    ver = commit_delete_equality(spark, table, "k", vdf)
                    visible -= set(vals)
                    no_datafile_versions.append(ver)
                elif op[0] == "replace":
                    df = read_version(spark, table).repartition(1)
                    ver = commit_replace(df, table, ["k"])
                    # compaction folds all masks in (visible unchanged)
                else:  # rollback
                    cur = current_version(table)
                    target = (op[1] % cur) + 1
                    ver = rollback(table, target)
                    visible = set(model[target])
                model[ver] = frozenset(visible)
            counter[0] = next_id
            # (1) time travel reads every version's VISIBLE set exactly
            for v, expect in model.items():
                got = {r.k for r in read_version(spark, table, v).collect()}
                assert got == set(expect), (v, got, expect)
            # (2) delete commits add no data files and keep COUNT honest
            for v in no_datafile_versions:
                assert diff_files(table, v - 1, v) == []
                st_ = table_stats(table, v)
                if st_["count_exact"]:
                    assert st_["n_rows"] == len(model[v])
                else:
                    assert st_["n_rows"] >= len(model[v])
        finally:
            shutil.rmtree(table, ignore_errors=True)

    run()
