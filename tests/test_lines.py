"""Line-level dedup + boilerplate detection (pipeline/lines.py)."""

from neo4j_graph_algorithms_spark.pipeline.lines import (
    boilerplate_scores,
    line_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_line_dedup_first_occurrence_wins(spark):
    docs = _docs(spark, [
        (0, "s0", "alpha\nbeta"),
        (1, "s0", "beta\ngamma"),       # beta already seen in doc 0
        (2, "s0", "alpha\nbeta\ngamma"),  # everything seen
    ])
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[0].clean_text == "alpha\nbeta"
    assert out[0].n_lines == 2 and out[0].kept_lines == 2
    assert out[1].clean_text == "gamma"
    assert out[1].kept_lines == 1
    assert out[2].clean_text == "" and out[2].kept_lines == 0


def test_line_dedup_within_doc_repeat(spark):
    docs = _docs(spark, [(0, "s0", "x\nx\ny")])
    out = line_dedup(docs).collect()[0]
    # the second x in the SAME doc is also a later occurrence
    assert out.clean_text == "x\ny"
    assert out.n_lines == 3 and out.kept_lines == 2


def test_line_dedup_order_preserved(spark):
    docs = _docs(spark, [
        (0, "s0", "b"),
        (1, "s0", "z\nb\na"),   # b dropped; z,a keep original order
    ])
    out = {r.doc_id: r.clean_text for r in line_dedup(docs).collect()}
    assert out[1] == "z\na"


def test_line_dedup_empty_text(spark):
    docs = _docs(spark, [(0, "s0", ""), (1, "s0", "")])
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[0].kept_lines == 1 and out[0].clean_text == ""
    assert out[1].kept_lines == 0 and out[1].n_lines == 1


def test_boilerplate_flags_site_header(spark):
    docs = _docs(spark, [
        (0, "s0", "NAV\nbody zero"),
        (1, "s0", "NAV\nbody one"),
        (2, "s0", "NAV\nbody two"),
        (3, "s1", "NAV\nother"),       # s1 has one doc -> nothing flagged
    ])
    out = {r.doc_id: r for r in
           boilerplate_scores(docs, frac=0.5).collect()}
    for d in (0, 1, 2):
        assert out[d].bp_lines == 1 and out[d].n_lines == 2
        assert abs(out[d].bp_frac - 0.5) < 1e-9
    assert out[3].bp_lines == 0


def test_boilerplate_frac_threshold(spark):
    # line 'half' in 2 of 4 docs = 0.5 -> flagged at frac=0.5,
    # not at frac=0.6
    docs = _docs(spark, [
        (0, "s0", "half\na"),
        (1, "s0", "half\nb"),
        (2, "s0", "c"),
        (3, "s0", "d"),
    ])
    lo = {r.doc_id: r.bp_lines for r in
          boilerplate_scores(docs, frac=0.5).collect()}
    hi = {r.doc_id: r.bp_lines for r in
          boilerplate_scores(docs, frac=0.6).collect()}
    assert lo[0] == 1 and lo[1] == 1 and lo[2] == 0
    assert hi[0] == 0 and hi[1] == 0


def test_boilerplate_repeat_counts_presence_not_instances(spark):
    # doc 0 repeats 'NAV' 3 times but that is ONE presence; with only
    # 1 of 2 site docs containing it, it is not boilerplate at 0.6
    docs = _docs(spark, [
        (0, "s0", "NAV\nNAV\nNAV"),
        (1, "s0", "body"),
    ])
    out = {r.doc_id: r for r in
           boilerplate_scores(docs, frac=0.6).collect()}
    assert out[0].bp_lines == 0
