"""Multimodal (image/audio) span processing — Ray-side plumbing, stub codecs.

The input tables interleave text and media spans (driver input_hint:
``spans: list<struct<kind, text, media_ref, offset>>``).  Media payloads are
opaque references/bytes with typed metadata; decode / resize /
frame-sampling / feature-extraction are actor-pool ``map_batches`` stages.

Three codec backends per stage: ``decoder="numpy"`` is a REAL byte-level
codec path (the engine's own BMP/PNG/JPEG/WAV parsers,
:mod:`..functions.codecs` — including a full baseline-JPEG Huffman
entropy decoder) — decode, pixel resize and PCM segmentation all operate
on genuine file bytes; ``decoder="fake"`` produces a deterministic fake
decode (seeded from the media_ref) so pipelines are testable without
payloads; ``decoder="real"`` raises ``NotImplementedError`` at actor
construction, marking exactly where an out-of-scope codec
(MP3/H.264-class, needing torchaudio/ffmpeg — not in this container)
plugs in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_FEATURE_DIM = 8


def explode_spans(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                  spans_col: str = "spans") -> ray.data.Dataset:
    """Flatten documents to one row per span:
    (doc_id, span_index, kind, text, media_ref, offset)."""

    def explode(b: pa.Table) -> pa.Table:
        spans = b[spans_col].combine_chunks()
        if isinstance(spans, pa.ChunkedArray):  # single chunk after combine
            spans = spans.chunk(0)
        offsets = spans.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(b)), counts)
        flat = spans.flatten()
        span_index = np.arange(len(flat)) - np.repeat(offsets[:-1], counts)
        return pa.table({
            id_col: b[id_col].take(pa.array(doc_idx)),
            "span_index": pa.array(span_index, pa.int32()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        })

    return ds.select_columns([id_col, spans_col]).map_batches(
        explode, batch_format="pyarrow")


class MediaDecode:
    """Actor-pool decode stage.  __init__ loads the codec ONCE per actor;
    __call__ decodes a batch of media spans into fixed-shape feature rows.

    Output schema: (doc_id, media_ref, kind, width, height, n_bytes,
    features: list<float>[MEDIA_FEATURE_DIM]).  Use small ``batch_size``
    when payloads are large binaries (ray_guide: memory-aware batching).
    """

    def __init__(self, decoder: str = "fake", id_col: str = "doc_id",
                 emit: str = "features"):
        if decoder == "real":  # pragma: no cover - no codec libs in sandbox
            raise NotImplementedError(
                "MP3/H.264-class media requires ffmpeg/torchaudio, "
                "which are not available in this environment; use "
                "decoder='numpy' (real BMP/PNG/JPEG/WAV byte parsing) "
                "or decoder='fake'")
        assert decoder in ("fake", "numpy")
        assert emit in ("features", "stats")
        if emit == "stats" and decoder != "numpy":
            raise ValueError("emit='stats' checksums decoded raw arrays; "
                             "it requires decoder='numpy'")
        self.decoder = decoder
        self.id_col = id_col
        self.emit = emit
        if decoder == "numpy":
            # load the codec dispatch once per actor
            from ..functions.codecs import (audio_stats, decode_image,
                                            decode_wav, image_stats)
            self._img, self._wav = decode_image, decode_wav
            self._img_stats, self._wav_stats = image_stats, audio_stats

    @staticmethod
    def _fake_decode(ref: str) -> tuple[int, int, int, np.ndarray]:
        # Every value is md5-HEX arithmetic (second hash is over the hex
        # string, not the digest bytes) so a DuckDB oracle reproduces
        # width/height/features exactly with md5()/substr() — see
        # queries.q_media_features.
        hx = hashlib.md5(ref.encode()).hexdigest()
        w = 16 + int(hx[0:2], 16) % 48
        ht = 16 + int(hx[2:4], 16) % 48
        raw = np.frombuffer(
            bytes.fromhex(hashlib.md5(hx.encode()).hexdigest()) * 4,
            dtype=np.uint8)
        feats = raw[:MEDIA_FEATURE_DIM].astype(np.float64) / 255.0
        return w, ht, w * ht, feats

    def _numpy_decode(self, kind: str, payload: bytes
                      ) -> tuple[int, int, int, np.ndarray]:
        """Real decode: BMP/PNG image -> RGB stats, WAV audio -> signal
        stats.  Feature layout (MEDIA_FEATURE_DIM=8):
        image: [mean_r, mean_g, mean_b, std_r, std_g, std_b, w/256, h/256]
        audio: [mean, std, rms, zero-cross rate, dur_s/60, sr/48k, ch, 1]."""
        if kind == "image":
            img = self._img(payload)
            h, w, _ = img.shape
            f = img.reshape(-1, 3).astype(np.float64) / 255.0
            feats = np.concatenate([f.mean(axis=0), f.std(axis=0),
                                    [w / 256.0, h / 256.0]])
            return w, h, len(payload), feats
        sr, s = self._wav(payload)
        x = s.astype(np.float64) / 32768.0
        n, ch = s.shape
        zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) \
            if n > 1 else 0.0
        feats = np.array([x.mean(), x.std(),
                          float(np.sqrt((x * x).mean())), zc,
                          n / sr / 60.0, sr / 48000.0, float(ch), 1.0])
        return n, ch, len(payload), feats

    def _stats_call(self, batch: pa.Table) -> pa.Table:
        """emit="stats": decode each payload and checksum the RAW decoded
        array — exact-integer output (pix_sum, crc32) comparable against
        the generator's pre-encode ground truth (synth.media_expected),
        which is what puts this stage under the driver's hash gate."""
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        keep = [i for i, k in enumerate(kinds) if k != "text"]
        ws, hs, nb, sums, crcs = [], [], [], [], []
        for i in keep:
            if kinds[i] == "image":
                w, h, psum, crc = self._img_stats(self._img(payloads[i]))
            else:
                _sr, s = self._wav(payloads[i])
                w, h, psum, crc = self._wav_stats(s)
            ws.append(w)
            hs.append(h)
            nb.append(len(payloads[i]))
            sums.append(psum)
            crcs.append(crc)
        take = pa.array(keep, pa.int64())
        return pa.table({
            self.id_col: batch[self.id_col].take(take),
            "span_index": batch["span_index"].take(take),
            "media_ref": batch["media_ref"].take(take),
            "kind": batch["kind"].take(take),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_bytes": pa.array(nb, pa.int64()),
            "pix_sum": pa.array(sums, pa.int64()),
            "crc32": pa.array(crcs, pa.int64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit == "stats":
            return self._stats_call(batch)
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        keep = [i for i, k in enumerate(kinds) if k != "text"]
        ws, hs, nb, fs = [], [], [], []
        if self.decoder == "numpy":
            payloads = batch["payload"].to_pylist()
            for i in keep:
                w, h, n, f = self._numpy_decode(kinds[i], payloads[i])
                ws.append(w)
                hs.append(h)
                nb.append(n)
                fs.append(f.tolist())
        else:
            for i in keep:
                w, h, n, f = self._fake_decode(refs[i])
                ws.append(w)
                hs.append(h)
                nb.append(n)
                fs.append(f.tolist())
        take = pa.array(keep, pa.int64())
        return pa.table({
            self.id_col: batch[self.id_col].take(take),
            "media_ref": batch["media_ref"].take(take),
            "kind": batch["kind"].take(take),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_bytes": pa.array(nb, pa.int64()),
            "features": pa.array(fs, pa.list_(pa.float64())),
        })


class MediaResize:
    """Actor-pool resize stage.

    ``decoder="fake"``: metadata-only — width/height in, resized dims out
    (the round-1 plumbing).  ``decoder="numpy"``: REAL pixel resize — rows
    carry a ``payload`` column of BMP, PNG or baseline-JPEG bytes; each
    image is decoded with the engine's own codec, nearest-neighbor
    resampled so max(w, h) == target (aspect preserved), and re-encoded
    to a ``resized_payload`` column in the SAME format it arrived in
    (JPEG re-encodes at the codec's default quality).
    Formats outside BMP/PNG/JPEG (WebP/HEIC-class) stay behind
    ``decoder="real"``."""

    def __init__(self, target: int = 32, decoder: str = "fake"):
        if decoder == "real":  # pragma: no cover
            raise NotImplementedError(
                "resize of WebP/HEIC-class images requires PIL; "
                "use decoder='numpy' for BMP/PNG/JPEG payloads")
        assert decoder in ("fake", "numpy")
        self.target = target
        self.decoder = decoder
        if decoder == "numpy":
            from ..functions.codecs import (decode_image, encode_image,
                                            sniff_image_format)
            self._dec, self._enc = decode_image, encode_image
            self._sniff = sniff_image_format

    @staticmethod
    def _nn_grid(n_out: int, n_in: int) -> np.ndarray:
        # pixel-center nearest neighbor: src = floor((i + .5) * in/out)
        return np.minimum(((np.arange(n_out) + 0.5) * n_in
                           / n_out).astype(np.int64), n_in - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "fake":
            w = batch["width"].to_numpy(zero_copy_only=False)
            h = batch["height"].to_numpy(zero_copy_only=False)
            scale = self.target / np.maximum(w, h)
            return (batch
                    .append_column("resized_w", pa.array(
                        np.maximum(1, (w * scale).astype(np.int32))))
                    .append_column("resized_h", pa.array(
                        np.maximum(1, (h * scale).astype(np.int32)))))
        ws, hs, payloads = [], [], []
        for buf in batch["payload"].to_pylist():
            img = self._dec(buf)
            h, w, _ = img.shape
            scale = self.target / max(w, h)
            ow = max(1, int(w * scale))
            oh = max(1, int(h * scale))
            out = img[self._nn_grid(oh, h)][:, self._nn_grid(ow, w)]
            ws.append(ow)
            hs.append(oh)
            payloads.append(self._enc(out, self._sniff(buf)))
        return (batch.drop_columns(["payload"])
                .append_column("resized_w", pa.array(ws, pa.int32()))
                .append_column("resized_h", pa.array(hs, pa.int32()))
                .append_column("resized_payload",
                               pa.array(payloads, pa.binary())))


class FrameSample:
    """Actor-pool frame/segment sampler for audio(/video) spans: emits
    ``n_frames`` evenly spaced frames per media row.

    ``decoder="fake"``: reference-only fan-out (one row per frame with a
    deterministic byte offset).  ``decoder="numpy"``: REAL segmentation —
    rows carry a ``payload`` column of WAV bytes; each clip is decoded
    with the engine's own PCM codec, split into ``n_frames`` equal sample
    segments, and each output row carries the segment's sample offset,
    length and RMS energy.  Video frame extraction (H.264) stays behind
    ``decoder="real"`` (needs ffmpeg)."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder == "real":  # pragma: no cover
            raise NotImplementedError(
                "video frame sampling requires ffmpeg; use decoder='numpy' "
                "for WAV payloads")
        assert decoder in ("fake", "numpy")
        self.n = n_frames
        self.decoder = decoder
        if decoder == "numpy":
            from ..functions.codecs import decode_wav
            self._dec = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = len(batch)
        idx = np.repeat(np.arange(m), self.n)
        frame = np.tile(np.arange(self.n, dtype=np.int32), m)
        take = pa.array(idx)
        if self.decoder == "fake":
            n_bytes = batch["n_bytes"].to_numpy(zero_copy_only=False)
            offs = (n_bytes[idx] * frame / self.n).astype(np.int64)
            return pa.table({
                "doc_id": batch["doc_id"].take(take),
                "media_ref": batch["media_ref"].take(take),
                "frame_index": pa.array(frame),
                "frame_offset": pa.array(offs),
            })
        offs, lens, rms = [], [], []
        for buf in batch["payload"].to_pylist():
            _sr, s = self._dec(buf)
            n = s.shape[0]
            # segment i covers samples [i*n//N, (i+1)*n//N) — exact cover
            bounds = (np.arange(self.n + 1) * n) // self.n
            x = s.astype(np.float64) / 32768.0
            for i in range(self.n):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                offs.append(lo)
                lens.append(hi - lo)
                rms.append(float(np.sqrt((x[lo:hi] ** 2).mean()))
                           if hi > lo else 0.0)
        return pa.table({
            "doc_id": batch["doc_id"].take(take),
            "media_ref": batch["media_ref"].take(take),
            "frame_index": pa.array(frame),
            "frame_offset": pa.array(offs, pa.int64()),
            "frame_len": pa.array(lens, pa.int64()),
            "frame_rms": pa.array(rms, pa.float64()),
        })


def media_features(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                   spans_col: str = "spans", decoder: str = "fake",
                   payload_store: "pa.Table | None" = None,
                   batch_size: int = 1024, emit: str = "features",
                   concurrency=(1, 4),
                   min_blocks: int | None = None) -> ray.data.Dataset:
    """documents -> exploded media spans -> decoded feature rows.

    ``decoder="numpy"`` decodes REAL bytes with the engine's own BMP/WAV
    codecs (:mod:`..functions.codecs`); pass ``payload_store`` — a
    ``(media_ref, payload)`` table — which is broadcast once via ray.put
    and attached per batch (the small-side lookup pattern; a production
    store would be fetched inside the actor by ref instead).

    ``min_blocks``: decode parallelism follows the INPUT's block count —
    an actor-pool task consumes a whole input bundle, so a dataset built
    from one in-memory table feeds exactly one actor no matter what
    ``concurrency`` says (measured: 3.8s serial vs 0.5s at 24 blocks for
    a 4k-span store).  Set it (~2-3x the actor cap) when the input is
    small-blocked; leave None for real multi-block inputs where a
    repartition would be a pointless shuffle.  It is a true MINIMUM: an
    input already at or above ``min_blocks`` blocks is left alone (never
    coalesced down), and an input whose block count is unknowable without
    executing (a lazy read) is assumed multi-block and also left alone —
    the scale-safe default."""
    spans = explode_spans(ds, id_col=id_col, spans_col=spans_col)
    if min_blocks is not None:
        try:
            nb = ds.num_blocks()  # known only for materialized inputs
        except NotImplementedError:
            nb = None
        if nb is not None and nb < min_blocks:
            spans = spans.repartition(min_blocks)
    if decoder == "numpy":
        import ray as _ray
        if payload_store is None:
            raise ValueError("decoder='numpy' needs a payload_store table")
        store_ref = _ray.put(payload_store)

        def attach(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            store = _ray.get(store_ref)
            idx = pc.index_in(b["media_ref"].combine_chunks(),
                              value_set=store["media_ref"].combine_chunks())
            return b.append_column("payload", store["payload"].take(idx))

        spans = spans.map_batches(attach, batch_format="pyarrow",
                                  batch_size=batch_size)
    return spans.map_batches(
        MediaDecode, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(decoder=decoder, id_col=id_col,
                                   emit=emit),
        concurrency=concurrency)
