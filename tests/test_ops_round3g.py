"""GVID video container + frame-sampling stage: roundtrip, stride
selection, malformed-payload quarantine flags, fan-out row layout."""

import numpy as np
import pyarrow as pa
import pytest

from gis_scripts_ray.stages.multimodal import (
    FrameSampleStage,
    decode_bmp,
    encode_bmp,
    encode_gvid,
    gvid_frames,
    sample_frames,
)


def _frame(seed: int) -> bytes:
    p = np.arange(192, dtype=np.int64)
    return encode_bmp((((seed + p) % 256).astype(np.uint8)).reshape(8, 8, 3))


class TestGvidContainer:
    def test_roundtrip(self):
        frames = [_frame(3), _frame(77), _frame(200)]
        payload = encode_gvid(frames)
        out = gvid_frames(payload)
        assert out == frames
        assert (decode_bmp(out[1]) == decode_bmp(frames[1])).all()

    def test_empty_video(self):
        assert gvid_frames(encode_gvid([])) == []

    @pytest.mark.parametrize(
        "payload",
        [b"", b"GVI", b"XXXX\x01\x00\x00\x00", b"GVID\x02\x00\x00\x00\x05\x00\x00\x00ab"],
    )
    def test_malformed_rejected(self, payload):
        with pytest.raises(ValueError):
            gvid_frames(payload)

    def test_trailing_bytes_rejected(self):
        with pytest.raises(ValueError):
            gvid_frames(encode_gvid([_frame(1)]) + b"junk")


class TestFrameSampleStage:
    def _batch(self):
        vids = [
            encode_gvid([_frame(s * 10 + f) for f in range(n)])
            for s, n in ((1, 5), (2, 1), (3, 4))
        ]
        return pa.table(
            {
                "doc": pa.array([100, 200, 300], pa.int64()),
                "video": pa.array(vids, pa.binary()),
            }
        )

    def test_stride_selection_and_fanout(self):
        out = FrameSampleStage("video", stride=2)(self._batch())
        df = out.to_pandas()
        # doc 100: frames 0,2,4; doc 200: frame 0; doc 300: frames 0,2
        assert df[df["doc"] == 100]["frame_idx"].tolist() == [0, 2, 4]
        assert df[df["doc"] == 200]["frame_idx"].tolist() == [0]
        assert df[df["doc"] == 300]["frame_idx"].tolist() == [0, 2]
        assert df["decoded_ok"].all()
        assert (df["height"] == 8).all() and (df["width"] == 8).all()

    def test_pixel_sums_match_direct_decode(self):
        out = FrameSampleStage("video", stride=1)(self._batch()).to_pandas()
        row = out[(out["doc"] == 100) & (out["frame_idx"] == 3)].iloc[0]
        want = int(decode_bmp(_frame(13)).astype(np.int64).sum())
        assert row["pixel_sum"] == want

    def test_malformed_payload_flagged_not_dropped(self):
        t = pa.table(
            {
                "doc": pa.array([1, 2], pa.int64()),
                "video": pa.array([b"not a video", encode_gvid([_frame(9)])], pa.binary()),
            }
        )
        df = FrameSampleStage("video", stride=1)(t).to_pandas()
        bad = df[df["doc"] == 1]
        assert len(bad) == 1
        assert not bad["decoded_ok"].iloc[0] and bad["frame_idx"].iloc[0] == -1
        assert df[df["doc"] == 2]["decoded_ok"].all()

    def test_distributed_stage_matches_local(self, ray_session):
        import ray.data

        t = self._batch()
        got = (
            sample_frames(
                ray.data.from_arrow(t).repartition(3), "video", stride=2, concurrency=2
            )
            .to_pandas()
            .sort_values(["doc", "frame_idx"])
            .reset_index(drop=True)
        )
        want = (
            FrameSampleStage("video", stride=2)(t)
            .to_pandas()
            .sort_values(["doc", "frame_idx"])
            .reset_index(drop=True)
        )
        assert got.equals(want)
