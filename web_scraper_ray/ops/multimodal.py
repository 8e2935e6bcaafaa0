"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are import-guarded: ``engine="pil"``/``"auto"``
run the real Pillow decode when it is installed (zero code changes the
day the environment grows PIL), and the default ``engine="stub"`` is a
deterministic fake decode (for tests of the plumbing — schema,
batching, actor lifecycle, output layout; and the SQL-oracled
``media_features`` contract) or ``NotImplementedError`` in strict mode.
The Ray-side structure is real and is the part that matters at scale:
small ``batch_size`` for wide binary rows, setup-once-per-actor, fixed
Arrow output schema.
"""

from __future__ import annotations

import hashlib
import io
import math

import numpy as np
import pyarrow as pa

import ray.data


def _load_pil():
    """Import guard for the real decoder. The container has no PIL, so
    ``engine="auto"`` falls back to the deterministic stub; the day the
    environment grows Pillow, ``engine="pil"``/``"auto"`` decode for
    real with zero code changes."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def _resolve_engine(engine: str) -> tuple[str, object]:
    if engine == "auto":
        pil = _load_pil()
        return ("pil", pil) if pil is not None else ("stub", None)
    if engine == "pil":
        pil = _load_pil()
        if pil is None:
            raise ImportError(
                "engine='pil' requires Pillow, which is not installed; "
                "use engine='stub' (deterministic fake) or 'auto'")
        return "pil", pil
    if engine == "stub":
        return "stub", None
    raise ValueError(f"unknown engine {engine!r} (stub | pil | auto)")

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests (payload bytes
    derived from md5 of ``seed:id`` — no external data)."""
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        # md5 (not blake2b): DuckDB reproduces this generator exactly,
        # which is what makes the media_features query SQL-oracled
        h = bytes.fromhex(hashlib.md5(f"{seed}:{i}".encode()).hexdigest())
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(h * (8 + i % 17))
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(64 + (i % 8) * 16 if kind != "audio" else 0)
        rows["height"].append(48 + (i % 8) * 12 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + i * 37)
    return pa.table({n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type)
                     for n_ in MEDIA_SCHEMA.names})


class ImageFeatureExtractor:
    """Actor-pool stage: decode + feature-extract images.

    ``engine="stub"`` (default — the deterministic contract the
    ``media_features`` SQL oracle replays; synthetic payloads are not
    decodable images) computes a fake feature vector from the payload
    bytes so the pipeline shape (schema in/out, batching, actor reuse)
    is fully exercised. ``engine="pil"`` decodes for real (grayscale
    histogram feature; Pillow import-guarded — absent in this
    container); ``engine="auto"`` picks pil when importable.
    ``strict=True`` (legacy) raises NotImplementedError at the decoder
    seam."""

    def __init__(self, feature_dim: int = 16, strict: bool = False,
                 engine: str = "stub"):
        self.feature_dim = feature_dim
        self.strict = strict
        # once per actor: resolve the decoder (a real deploy also loads
        # its model here)
        self.engine, self._pil = _resolve_engine(engine)

    def _decode_and_embed(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/torchvision — not available in this container"
            )
        if self.engine == "pil":
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            px = np.asarray(img, dtype=np.uint8)
            hist, _ = np.histogram(
                px, bins=self.feature_dim, range=(0, 256))
            v = hist.astype(np.float64)
            n = np.linalg.norm(v)
            return v / (n if n else 1.0)
        # deterministic fake: md5 over the payload HEX (DuckDB md5 is
        # VARCHAR-only, so hashing the hex keeps the twin exact) →
        # normalized histogram-ish vector; feature_dim <= 16 (md5 width)
        h = hashlib.md5(payload.hex().encode()).digest()[: self.feature_dim]
        v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode_and_embed(p)
            for p in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float64())),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample frame offsets from video rows.

    STUB decode (no ffmpeg here): emits the deterministic frame-offset
    plan (what a real sampler would seek to) as one row per frame —
    the flat_map layout a real decoder would fill with pixels."""

    def __init__(self, fps_target: float = 1.0):
        self.fps_target = fps_target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets = [], []
        for mid, kind, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video":
                continue
            step = int(1000 / self.fps_target)
            for off in range(0, int(dur), step):
                ids.append(mid)
                offsets.append(off)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_offset_ms": pa.array(offsets, pa.int64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize image payloads to ``width`` x
    ``height``.

    STUB decode (no PIL here; ``strict=True`` raises at the exact
    seam a real decoder plugs into): the payload's bytes are treated
    as a square byte grid (side = isqrt(len)) and resized by
    nearest-neighbor index sampling — deterministic, so the output
    layout (binary column + integer dims riding alongside) is real
    and testable. Ray shape: callable CLASS → setup once per actor;
    binary payloads are wide → callers pass a small batch_size."""

    def __init__(self, width: int = 8, height: int = 8,
                 strict: bool = False, engine: str = "stub"):
        if strict:
            raise NotImplementedError(
                "real image decode/resize needs PIL/cv2 — absent in "
                "this environment; the stub resizes the raw byte grid")
        self.engine, self._pil = _resolve_engine(engine)
        self.width = width
        self.height = height
        # precomputed per-actor: the nearest-neighbor index grid is a
        # pure function of (side, width, height), memoized per side
        self._grids: dict[int, np.ndarray] = {}

    def _grid(self, side: int) -> np.ndarray:
        g = self._grids.get(side)
        if g is None:
            ys = (np.arange(self.height) * side) // self.height
            xs = (np.arange(self.width) * side) // self.width
            g = (ys[:, None] * side + xs[None, :]).ravel()
            self._grids[side] = g
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            if self.engine == "pil":
                img = self._pil.open(io.BytesIO(payload)).convert("RGB")
                img = img.resize((self.width, self.height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
                continue
            buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            side = max(1, math.isqrt(len(buf)))
            out.append(buf[self._grid(side)].tobytes())
        return pa.table({
            "media_id": batch["media_id"],
            "payload": pa.array(out, pa.large_binary()),
            "width": pa.array([self.width] * batch.num_rows, pa.int64()),
            "height": pa.array([self.height] * batch.num_rows,
                               pa.int64()),
        })


def media_feature_pipeline(ds: ray.data.Dataset, concurrency: int = 2,
                           batch_size: int = 16) -> ray.data.Dataset:
    """Binary payloads are wide → small batch_size; extractor is a
    callable class → actor pool with per-actor setup."""
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
