"""End-to-end corpus-prep CLI pipeline test (quality gate -> exact dedup ->
scrub -> chunk -> resumable partitioned export)."""

import sys


def test_corpus_pipeline_counts(ray_session, sf_dir, tmp_path):
    sys.path.insert(0, "scripts")
    from run_corpus_prep import build_pipeline

    from kafka_connect_jdbc_flatten_ray.stages.export import (
        export_corpus_partitioned,
    )

    chunks = build_pipeline(sf_dir)
    out = str(tmp_path / "corpus")
    m = export_corpus_partitioned(chunks, out, rows_per_part=250)
    # quality model keeps most docs; every kept doc yields >= 1 chunk
    assert m["rows"] >= 400
    assert m["skipped"] == []
    # resume: nothing rewritten
    m2 = export_corpus_partitioned(build_pipeline(sf_dir), out, rows_per_part=250)
    assert m2["rows"] == m["rows"] and len(m2["skipped"]) == len(m2["partitions"])
