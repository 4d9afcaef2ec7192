"""Semantics tests for ``pipeline.dedup.substring_dedup`` — exact
substring dedup (Lee et al. 2022 shape) on constructed corpora where
the expected spans are known by hand: canonical-first retention, span
merge across overlapping grams, token accounting, and the short-doc /
no-dup identity paths.  The registered query `dedup_substring_exact`
adds the DuckDB value oracle at sf0.01 on top of these."""

from __future__ import annotations

from fletcher_spark.pipeline.dedup import substring_dedup


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _run(spark, rows, k=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in substring_dedup(df, "doc_id", "text", k).collect()}


def test_identical_docs_keep_only_canonical(spark):
    """Two identical 20-token docs: the lower doc_id keeps its text
    verbatim; the higher one loses the whole span (one merged span of
    all 20 tokens, empty text_clean)."""
    t = _words("w", 20)
    got = _run(spark, [(2, t), (1, t)])
    assert got[1]["text_clean"] == t and got[1]["n_dup_tokens"] == 0
    assert got[2]["text_clean"] == "" and got[2]["n_dup_tokens"] == 20
    assert got[2]["n_spans"] == 1 and got[2]["n_tokens"] == 20


def test_shared_infix_cut_at_arbitrary_offset(spark):
    """A 10-token run shared mid-document (different offsets in each
    doc) is cut from the non-canonical doc only — the capability
    passage dedup (fixed chunk boundaries) cannot express."""
    shared = _words("s", 10)
    a = _words("a", 5) + " " + shared + " " + _words("b", 5)
    c = _words("c", 7) + " " + shared + " " + _words("d", 3)
    got = _run(spark, [(1, a), (2, c)])
    assert got[1]["n_dup_tokens"] == 0 and got[1]["text_clean"] == a
    # doc 2 loses exactly the 10 shared tokens, in one merged span,
    # keeping its own prefix and suffix
    assert got[2]["n_dup_tokens"] == 10 and got[2]["n_spans"] == 1
    assert got[2]["text_clean"] == _words("c", 7) + " " + _words("d", 3)


def test_overlapping_grams_merge_into_one_span(spark):
    """A 12-token duplicated run yields 5 overlapping stride-1 8-grams;
    they must merge to ONE span of 12 tokens, not 5 spans of 8."""
    shared = _words("s", 12)
    got = _run(spark, [(1, shared), (2, _words("x", 4) + " " + shared)])
    assert got[2]["n_spans"] == 1
    assert got[2]["n_dup_tokens"] == 12
    assert got[2]["text_clean"] == _words("x", 4)


def test_two_disjoint_spans_stay_separate(spark):
    """Two duplicated 8-gram runs separated by >1 unique token in the
    victim doc are reported as two spans."""
    s1, s2 = _words("p", 8), _words("q", 8)
    donor = s1 + " " + _words("u", 30) + " " + s2
    victim = s1 + " " + _words("v", 6) + " " + s2
    got = _run(spark, [(1, donor), (2, victim)])
    assert got[2]["n_spans"] == 2 and got[2]["n_dup_tokens"] == 16
    assert got[2]["text_clean"] == _words("v", 6)


def test_short_and_unique_docs_pass_through(spark):
    """Docs under k tokens and docs with no duplicated gram return
    unchanged with zero counters."""
    short = _words("t", 5)
    uniq = _words("z", 30)
    got = _run(spark, [(1, short), (2, uniq)])
    for i, t in ((1, short), (2, uniq)):
        assert got[i]["text_clean"] == t
        assert got[i]["n_spans"] == 0 and got[i]["n_dup_tokens"] == 0


def test_token_accounting_invariant(spark):
    """n_tokens - n_dup_tokens == len(split(text_clean)) for every row
    of a mixed corpus (the invariant the query docstring promises)."""
    shared = _words("s", 15)
    rows = [
        (1, shared),
        (2, shared + " " + _words("a", 9)),
        (3, _words("b", 3) + " " + shared + " " + _words("c", 4)),
        (4, _words("d", 40)),
        (5, _words("e", 6)),
    ]
    got = _run(spark, rows)
    for r in got.values():
        n_clean = 0 if r["text_clean"] == "" else len(r["text_clean"].split(" "))
        assert r["n_tokens"] - r["n_dup_tokens"] == n_clean, r


def test_intra_doc_repetition_is_cut(spark):
    """A doc repeating its own 8-gram keeps the first occurrence and
    cuts the second — duplication is positional, not doc-pairwise."""
    s = _words("r", 8)
    doc = s + " " + _words("m", 4) + " " + s
    got = _run(spark, [(1, doc)])
    assert got[1]["n_dup_tokens"] == 8 and got[1]["n_spans"] == 1
    assert got[1]["text_clean"] == s + " " + _words("m", 4)


def test_plan_is_scale_safe(spark):
    """The plan must carry no corpus-wide rank window: duplicate
    detection is a gram-keyed HashAggregate + join-back, and the only
    windows partition by the doc id (registry lint re-checks this for
    the registered query; pinned here for the operator itself)."""
    from fletcher_spark.plans.lint import assert_scale_safe

    df = spark.createDataFrame(
        [(i, _words("w", 20)) for i in range(10)], "doc_id long, text string"
    )
    out = substring_dedup(df)
    assert_scale_safe(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---- property: differential vs a pure-Python reference ----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocab + short docs force gram collisions so duplicated spans,
# overlaps, and intra-doc repeats all actually occur in sampled corpora
_st_doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=14
).map(" ".join)
_st_corpus = st.lists(_st_doc, min_size=1, max_size=6)


def _reference(docs: list[str], k: int):
    """Direct O(n²) implementation of the spec: mark every occurrence
    of a ≥2×-occurring k-gram except the corpus-wide min-(id, pos)
    one, merge overlapping/adjacent spans, cut covered tokens."""
    toks = {i: d.split(" ") for i, d in enumerate(docs)}
    occs: dict[tuple, list[tuple]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occs.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    marked: dict[int, list[int]] = {i: [] for i in toks}
    for locs in occs.values():
        if len(locs) >= 2:
            for i, p in sorted(locs)[1:]:
                marked[i].append(p)
    out = {}
    for i, ts in toks.items():
        spans = []
        for p in sorted(marked[i]):
            a, b = p, p + k - 1
            if spans and a <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], b))
            else:
                spans.append((a, b))
        covered = {j for a, b in spans for j in range(a, b + 1)}
        clean = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (
            len(ts),
            len(spans),
            sum(b - a + 1 for a, b in spans),
            " ".join(clean),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=_st_corpus, k=st.integers(min_value=2, max_value=4))
def test_substring_dedup_matches_reference(spark, corpus, k):
    """Differential property: the distributed plan equals the direct
    O(n²) single-machine spec on adversarial corpora (3-word vocab, so
    gram collisions are dense) for every output column."""
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_dup_tokens"], r["text_clean"])
        for r in substring_dedup(df, "doc_id", "text", k).collect()
    }
    assert got == _reference(corpus, k)


def test_null_text_yields_all_null_row(spark):
    """NULL text follows the pipeline-wide null convention (same as the
    multimodal decode tiers): an all-NULL row, never a fabricated
    zero-token doc — and it must not perturb other docs' results."""
    t = _words("w", 20)
    got = _run(spark, [(1, t), (2, None), (3, t)])
    r = got[2]
    assert r["n_tokens"] is None and r["n_spans"] is None
    assert r["n_dup_tokens"] is None and r["text_clean"] is None
    assert got[1]["text_clean"] == t and got[3]["text_clean"] == ""


def test_k_below_one_raises(spark):
    """k < 1 is a caller bug: fail fast instead of emitting
    negative-length spans that violate the output invariants."""
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        substring_dedup(df, "doc_id", "text", 0)


def test_gram_occurrences_rejects_colliding_id_col(spark):
    """The (id, pos, gram) output format is fixed: an id column named
    like an output/internal column must be rejected up front, not fail
    later with an ambiguous-reference AnalysisException."""
    import pytest

    from fletcher_spark.pipeline.dedup import gram_occurrences

    df = spark.createDataFrame([(1, "a b c d")], "pos long, text string")
    with pytest.raises(ValueError, match="collides"):
        gram_occurrences(df, "pos", "text", 2)


def test_bloom_prefilter_matches_plain_join_bit_for_bit(spark):
    """bloom_bits=None (plain join) and the default Bloom pre-filter
    must agree on every output column — the bloom is a pure shuffle
    refinement, never a semantics knob.  Run on a dense-collision
    corpus so both duplicated and singleton grams are exercised."""
    shared = _words("s", 15)
    rows = [
        (1, shared),
        (2, shared + " " + _words("a", 9)),
        (3, _words("b", 3) + " " + shared + " " + _words("c", 4)),
        (4, _words("d", 40)),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup(df, "doc_id", "text", 8, bloom_bits=None).collect()
    }
    bloom = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup(
            df, "doc_id", "text", 8, bloom_bits=1 << 26
        ).collect()
    }
    assert bloom == plain


def test_bloom_prefilter_branch_taken_on_tiny_dup_ratio(spark):
    """Planted corpus where almost every gram is a singleton (one
    duplicated 8-gram in 60 docs of unique text): with the pre-filter
    forced on, the bitmap build (its ``bit_or`` word aggregate) and the
    broadcast word-lookup join must appear in the physical plan, and
    the one duplicated span must still be cut."""
    dup_run = _words("dup", 8)
    rows = [(i, _words(f"u{i}_", 20)) for i in range(1, 59)]
    rows += [(100, dup_run), (101, dup_run)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_dedup(df, "doc_id", "text", 8, bloom_bits=1 << 26)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bit_or" in plan  # the bitmap word aggregate
    assert "BroadcastHashJoin" in plan  # the bitmap word-lookup join
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[100]["text_clean"] == dup_run
    assert got[101]["text_clean"] == "" and got[101]["n_dup_tokens"] == 8
    for i in range(1, 59):
        assert got[i]["n_dup_tokens"] == 0


def test_bloom_auto_gate_follows_input_size_estimate(spark):
    """``bloom_bits="auto"`` (the default) decides from the optimizer's
    size estimate without running a job: a tiny input plans WITHOUT the
    bitmap branch (no ``bit_or`` word aggregate), and the threshold
    constant gates the flip — the InjectRuntimeFilter pattern."""
    import fletcher_spark.pipeline.dedup as D

    from tests.conftest import SF_DIR

    # parquet-backed input: the file source reports a real size estimate
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    auto_plan = substring_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "bit_or" not in auto_plan  # tiny known input: pre-filter off
    old = D._BLOOM_AUTO_THRESHOLD
    try:
        D._BLOOM_AUTO_THRESHOLD = -1  # every estimate exceeds it
        forced = substring_dedup(df)._jdf.queryExecution().executedPlan().toString()
    finally:
        D._BLOOM_AUTO_THRESHOLD = old
    assert "bit_or" in forced  # large estimate: pre-filter on
    # UNKNOWN size (python-local input → MaxValue estimate) counts as
    # large — the conservative scale-safe branch
    local = spark.createDataFrame(
        [(1, _words("a", 12)), (2, _words("a", 12))], "doc_id long, text string"
    )
    unk = substring_dedup(local)._jdf.queryExecution().executedPlan().toString()
    assert "bit_or" in unk
    # invalid widths fail fast instead of REMAINDER_BY_ZERO mid-job (or
    # a silent drop-everything NULL filter with ansi off)
    import pytest as _pytest

    for bad in (0, -8, 63, 2.5):
        with _pytest.raises(ValueError, match="bloom_bits"):
            substring_dedup(local, bloom_bits=bad)


def test_many_disjoint_spans_reconstruction(spark):
    """Adversarial many-spans doc (200 disjoint 2-token spans, each
    separated by one unique token): the gap-sweep reconstruction must
    cut every span and keep every separator — the shape that made the
    old per-token exists() scan O(tokens × spans)."""
    k = 2
    donor = " ".join(f"s{i}a s{i}b d{i}x d{i}y" for i in range(200))
    victim = " ".join(f"s{i}a s{i}b u{i}" for i in range(200))
    got = _run(spark, [(1, donor), (2, victim)], k=k)
    assert got[1]["n_dup_tokens"] == 0 and got[1]["text_clean"] == donor
    assert got[2]["n_spans"] == 200 and got[2]["n_dup_tokens"] == 400
    assert got[2]["text_clean"] == " ".join(f"u{i}" for i in range(200))


def test_scope_values_with_delimiter_bytes_do_not_collide(spark):
    """Scope folding is injection-proof: a scope value containing the
    \\x1f delimiter (or literally equal to the NULL sentinel) must not
    merge with a different scope combination — each part is hashed
    before folding (ADVICE r6)."""
    from fletcher_spark.pipeline.dedup import substring_dedup as sd

    t = _words("w", 10)
    rows = [
        # two scope columns; ("a\x1fb", "c") must differ from ("a", "b\x1fc")
        (1, t, "a\x1fb", "c"),
        (2, t, "a", "b\x1fc"),
        # the literal sentinel string must not merge with a real NULL
        (3, t, "\x00null", "c"),
        (4, t, None, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, s1 string, s2 string")
    got = {
        r["doc_id"]: r for r in sd(df, "doc_id", "text", 8, ("s1", "s2")).collect()
    }
    for i in (1, 2, 3, 4):
        assert got[i]["text_clean"] == t and got[i]["n_dup_tokens"] == 0, i


def test_gram_occurrences_rejects_colliding_scope_col(spark):
    """scope_cols get the same up-front reserved-name validation as
    id_col — a scope column named 'pos'/'_toks' (or equal to id_col)
    must fail fast, not with a downstream ambiguous-reference error."""
    import pytest

    from fletcher_spark.pipeline.dedup import gram_occurrences

    df = spark.createDataFrame(
        [(1, "a b c d", "x")], "doc_id long, text string, pos string"
    )
    with pytest.raises(ValueError, match="scope column"):
        gram_occurrences(df, "doc_id", "text", 2, scope_cols=("pos",))
    with pytest.raises(ValueError, match="scope column"):
        gram_occurrences(df, "doc_id", "text", 2, scope_cols=("doc_id",))


def test_scope_cols_restrict_dedup_to_matching_scope(spark):
    """scope_cols folds the scope into the gram hash: identical spans
    in DIFFERENT languages are kept; within one language the usual
    canonical-first cut applies; a NULL scope is its own scope (never
    merged into a neighbor).  The global form must still cut across
    scopes when scope_cols is omitted."""
    from fletcher_spark.pipeline.dedup import substring_dedup as sd

    t = _words("w", 10)
    rows = [(1, t, "en"), (2, t, "de"), (3, t, "en"), (4, t, None), (5, t, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    scoped = {r["doc_id"]: r for r in sd(df, "doc_id", "text", 8, ("lang",)).collect()}
    # en: doc 1 canonical, doc 3 cut; de: doc 2 is alone -> kept;
    # NULL scope: doc 4 canonical, doc 5 cut
    assert scoped[1]["text_clean"] == t and scoped[2]["text_clean"] == t
    assert scoped[3]["text_clean"] == "" and scoped[3]["n_dup_tokens"] == 10
    assert scoped[4]["text_clean"] == t
    assert scoped[5]["text_clean"] == "" and scoped[5]["n_dup_tokens"] == 10

    # global form: only doc 1 survives
    global_ = {r["doc_id"]: r for r in sd(df, "doc_id", "text", 8).collect()}
    assert global_[1]["text_clean"] == t
    for i in (2, 3, 4, 5):
        assert global_[i]["text_clean"] == "", i
