"""ExactSubstr-shape duplicated-substring removal (stages/substrdedup.py)."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.substrdedup import substr_dedup_row, substr_dedup_rows


def _corpus():
    boiler = "subscribe to our newsletter for daily updates"
    return [
        f"doc one says {boiler} and then continues with unique text alpha",
        f"doc two intro before {boiler} trailing words beta gamma",
        "completely unique document with no shared fragments at all here",
        "self repeat x y z w v self repeat x y z w v tail",  # within-doc dup
        "short doc",  # fewer than n tokens
        "",
        "doubled  spaces  make  empty  tokens  sometimes doubled  spaces",
    ]


def _run(ray_session, texts, n=5, **kw):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        substr_dedup_rows(ds, n=n, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out["dedup_text"].tolist()


class TestSubstrDedup:
    def test_matches_python_reference(self, ray_session):
        texts = _corpus()
        assert _run(ray_session, texts) == substr_dedup_row(texts, n=5)

    def test_reference_semantics_spotchecks(self):
        texts = _corpus()
        out = substr_dedup_row(texts, n=5)
        # the shared boilerplate vanished from both carriers
        assert "subscribe" not in out[0] and "newsletter" not in out[1]
        # unique text survives verbatim
        assert out[2] == texts[2]
        # within-doc repetition is removed too (both copies)
        assert "repeat" not in out[3]
        # short docs and empty docs pass through
        assert out[4] == "short doc" and out[5] == ""

    def test_forced_join_path_identical(self, ray_session):
        texts = _corpus() * 3  # replicate so every gram duplicates
        ids_shift = [t + f" salt{i}" for i, t in enumerate(texts)]
        broad = _run(ray_session, ids_shift)
        joined = _run(
            ray_session, ids_shift, broadcast_limit=0, num_partitions=4
        )
        assert broad == joined == substr_dedup_row(ids_shift, n=5)

    def test_block_structure_invariance(self, ray_session):
        import ray

        texts = _corpus()
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        one = (
            substr_dedup_rows(ray.data.from_arrow(t), n=5)
            .to_pandas().sort_values("doc_id")["dedup_text"].tolist()
        )
        many = (
            substr_dedup_rows(ray.data.from_arrow(t).repartition(7), n=5)
            .to_pandas().sort_values("doc_id")["dedup_text"].tolist()
        )
        assert one == many

    def test_no_duplicates_passthrough(self, ray_session):
        texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six"]
        assert _run(ray_session, texts) == texts

    def test_everything_duplicated_goes_empty(self, ray_session):
        t = "a b c d e f g h"
        assert _run(ray_session, [t, t]) == ["", ""]
