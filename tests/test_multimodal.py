"""Real-codec multimodal tests: PPM/WAV/SSUV roundtrips, decode-vs-
generator ground truth, byte-range frame sampling, nearest-neighbor
resize — all in-container (no PIL)."""

import io
import struct
import wave

import numpy as np
import pyarrow as pa

from ssufid_ray.stages.multimodal import (FRAME_SCHEMA, MEDIA_META_SCHEMA,
                                          FrameSampler, ImageResizer,
                                          MediaDecoder, make_ppm, make_ssuv,
                                          make_wav, ppm_decode, ppm_encode,
                                          ssuv_frame_table, wav_decode)

SF = "/root/testdata/sf0.001"


def test_ppm_roundtrip_exact():
    px = (np.arange(11 * 7 * 3, dtype=np.uint32) % 251).astype(np.uint8)
    px = px.reshape(7, 11, 3)
    back = ppm_decode(ppm_encode(px))
    assert back.shape == (7, 11, 3)
    assert np.array_equal(back, px)
    assert ppm_decode(b"nonsense") is None
    assert ppm_decode(b"P6\n4 4\n65535\n" + b"\0" * 96) is None  # bad maxval


def test_wav_roundtrip_matches_stdlib():
    payload = make_wav(37)
    pcm, rate = wav_decode(payload)
    with wave.open(io.BytesIO(payload), "rb") as wf:
        assert rate == wf.getframerate() == 8000
        assert len(pcm) == wf.getnframes() == 160 + 37 % 160
    assert wav_decode(b"not riff") is None


def test_ssuv_frame_table_is_byte_exact():
    payload = make_ssuv(5, "hello world")
    table = ssuv_frame_table(payload)
    assert len(table) == 2 + 5 % 3
    # each table entry slices EXACTLY one generated frame
    for i, (off, ln) in enumerate(table):
        frame = payload[off:off + ln]
        assert frame == make_ppm(5 + i * 1013, f"hello world#{i}")
        assert ppm_decode(frame) is not None
    # truncated container is rejected, not mis-sliced
    assert ssuv_frame_table(payload[:-1]) is None
    assert ssuv_frame_table(b"XXXX" + payload[4:]) is None


def test_decoder_real_dims_match_generator():
    """Decoded width/height/features are REAL parse output: they must
    equal the generator's ground truth for every kind."""
    doc_ids = [3, 7, 11]  # image(3), audio(7... 7%3==1 audio), video(11%3==2)
    rows = []
    for d in doc_ids:
        kind = ("image", "audio", "video")[d % 3]
        payload = {"image": lambda: make_ppm(d, f"t{d}"),
                   "audio": lambda: make_wav(d),
                   "video": lambda: make_ssuv(d, f"t{d}")}[kind]()
        rows.append({"media_id": f"m{d}", "kind": kind, "payload": payload,
                     "content_type": "x"})
    batch = pa.Table.from_pylist(rows)
    out = {r["media_id"]: r for r in MediaDecoder()(batch).to_pylist()}
    assert MediaDecoder()(batch).schema.equals(MEDIA_META_SCHEMA)
    # image dims from the generator's formula
    assert out["m3"]["width"] == 8 + 3 % 24
    assert out["m3"]["height"] == 8 + (3 * 7) % 24
    px = ppm_decode(make_ppm(3, "t3"))
    gray = px.astype(np.float32).mean(axis=2) / 255.0
    cols = np.array_split(gray.mean(axis=0), 8)
    assert out["m3"]["feature"] == [
        np.float32(c.mean()) for c in cols]
    # audio: width = n_samples, height = rate, feature = RMS envelope
    assert out["m7"]["width"] == 160 + 7 % 160
    assert out["m7"]["height"] == 8000
    assert all(0.0 < f < 1.0 for f in out["m7"]["feature"])
    # video: first frame's dims
    f0 = ppm_decode(make_ppm(11, "t11#0"))
    assert (out["m11"]["width"], out["m11"]["height"]) == (
        f0.shape[1], f0.shape[0])


def test_frame_sampler_slices_and_strides():
    payload = make_ssuv(4, "vid")  # 4%3==1... kind irrelevant: 2+4%3=3 frames
    batch = pa.Table.from_pylist([
        {"media_id": "v1", "kind": "video", "payload": payload,
         "content_type": "video/x-ssuv"},
        {"media_id": "bad", "kind": "video", "payload": b"junk",
         "content_type": "video/x-ssuv"},
    ])
    out = FrameSampler(every_k=2)(batch)
    assert out.schema.equals(FRAME_SCHEMA)
    rows = out.to_pylist()
    assert [r["media_id"] for r in rows] == ["v1", "v1"]  # frames 0, 2 of 3
    assert [r["frame_no"] for r in rows] == [0, 2]
    table = ssuv_frame_table(payload)
    for r in rows:
        off, ln = table[r["frame_no"]]
        assert r["frame_payload"] == payload[off:off + ln]


def test_image_resizer_nearest_neighbor_exact():
    src = make_ppm(9, "img")
    px = ppm_decode(src)
    batch = pa.Table.from_pylist([
        {"media_id": "i1", "kind": "image", "payload": src,
         "content_type": "image/x-portable-pixmap"}])
    out = ImageResizer(width=16, height=16)(batch).to_pylist()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (16, 16)
    got = ppm_decode(out[0]["payload"])
    sh, sw, _ = px.shape
    yi = (np.arange(16) * sh) // 16
    xi = (np.arange(16) * sw) // 16
    assert np.array_equal(got, px[yi][:, xi])


def test_multimodal_queries_end_to_end(ray_session):
    from ssufid_ray.stages.multimodal import (media_frame_sample,
                                              media_resize, multimodal_meta)

    meta = multimodal_meta(SF)
    assert len(meta) > 0 and set(meta["kind"]) == {"image", "audio", "video"}
    # audio rows carry the real sample rate in `height`
    assert (meta.loc[meta["kind"] == "audio", "height"] == 8000).all()
    # image rows carry generator dims, which are <= 31 px
    assert (meta.loc[meta["kind"] == "image", "width"] <= 31).all()

    frames = media_frame_sample(SF, every_k=2)
    assert len(frames) > 0
    # 2..4 frames per video sampled at stride 2 -> 1 or 2 sampled frames
    assert set(frames["n_frames"]) <= {1, 2}

    rs = media_resize(SF)
    assert len(rs) > 0 and (rs["width"] == 16).all() and (rs["height"] == 16).all()
