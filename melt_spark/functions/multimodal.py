"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal pipelines: payloads are `binary` columns
(or object-store URIs) with typed metadata columns beside them; decode /
feature-extract / resize / frame-sample run as Arrow-batched Python
(mapInPandas) because codecs don't exist on the JVM. Batch shape, schema,
and partitioning are the real engineering; the codec call is a library call.

This container has no image/audio libraries, so the decode step is a
clearly-marked deterministic fake (byte-derived metadata) behind the same
Spark plumbing a real decoder would use; `real_decode` raises
NotImplementedError to mark the seam.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id long, n_bytes int, width int, height int,"
                 " n_frames int")
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int"


def attach_binary(df: DataFrame, text_col: str = "text",
                  out: str = "content") -> DataFrame:
    """Fixture adapter: derive an opaque binary payload column (utf-8 bytes
    of the text). Real pipelines read the bytes from parquet/object store."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def real_decode(content: bytes) -> dict:
    """The seam where a real codec (PIL/ffmpeg/soundfile) plugs in."""
    raise NotImplementedError(
        "no media codecs in this environment — fake_decode stands in")


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in: metadata derived from the byte payload only
    (restatable in SQL, so the Spark plumbing is oracle-checkable)."""
    n = len(content)
    return {"n_bytes": n, "width": 320 + n % 320, "height": 240 + n % 240,
            "n_frames": n % 5 + 1}


def decode_metadata(df: DataFrame, content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: Arrow batches in, metadata rows out. One narrow
    stage; partitioning of the input is preserved (no shuffle)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [fake_decode(b) for b in pdf[content_col]]
            out = pd.DataFrame(meta)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, content_col).mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = ("doc_id long, width int, height int, out_w int, out_h int")


def resize_metadata(df: DataFrame, target: int = 128,
                    content_col: str = "content",
                    id_col: str = "doc_id") -> DataFrame:
    """Resize step (aspect-preserving fit into target×target): the real
    pipeline calls PIL here; the dimension arithmetic — the part that
    determines batch shapes downstream — is exact and oracle-checkable."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                meta = fake_decode(bytes(b))
                w, h = meta["width"], meta["height"]
                scale_num, scale_den = target, max(w, h)
                rows.append((i, w, h,
                             max(1, (w * scale_num) // scale_den),
                             max(1, (h * scale_num) // scale_den)))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height",
                                              "out_w", "out_h"])

    return df.select(id_col, content_col).mapInPandas(run, RESIZE_SCHEMA)


FEATURE_SCHEMA = ("doc_id long, f_alpha int, f_digit int, f_space int,"
                  " f_other int")


def extract_features(df: DataFrame, content_col: str = "content",
                     id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over the binary payload (the embed/CLIP seam):
    deterministic byte-class histogram via Arrow-batched mapInPandas —
    the exact plumbing a real encoder uses (binary in, fixed-width feature
    row out), minus the model."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                alpha = digit = space = other = 0
                for byte in bytes(b):
                    if (65 <= byte <= 90) or (97 <= byte <= 122):
                        alpha += 1
                    elif 48 <= byte <= 57:
                        digit += 1
                    elif byte in (32, 9, 10, 13):
                        space += 1
                    else:
                        other += 1
                rows.append((i, alpha, digit, space, other))
            yield pd.DataFrame(rows, columns=[id_col, "f_alpha", "f_digit",
                                              "f_space", "f_other"])

    return df.select(id_col, content_col).mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, content_col: str = "content",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: one row per (doc, frame). Demonstrates the
    row-exploding mapInPandas shape a video pipeline uses."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                meta = fake_decode(b)
                per = meta["n_bytes"] // meta["n_frames"]
                for f in range(meta["n_frames"]):
                    ids.append(i)
                    idxs.append(f)
                    sizes.append(per)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": sizes})

    return df.select(id_col, content_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = ("doc_id long, n_chars int, n_windows int, "
                       "win_fp_first string, win_fp_last string")


def audio_windows(df: DataFrame, window: int = 64, hop: int = 48,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Audio-style strided WINDOW segmentation over the opaque payload —
    the frame/hop decomposition every audio featurizer (spectrogram,
    VAD, wav2vec-style encoders) runs first. The payload here is the
    fixture text standing in for PCM (the real soundfile decode is the
    module's NotImplementedError seam); the Spark-side shape is the real
    thing: Arrow-batched mapInPandas, one narrow stage, no shuffle,
    windows = floor((len - window)/hop) + 1 per doc with per-window md5
    fingerprints (dedup keys for repeated jingles/silence).

    Output: id, n_chars, n_windows (0 when the payload is shorter than
    one window), win_fp_first/win_fp_last (md5 of the first/last window;
    '' when n_windows = 0). Character-addressed so the DuckDB oracle's
    substr/md5 restatement matches on any unicode payload."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                n = len(t)
                nw = 0 if n < window else (n - window) // hop + 1
                if nw:
                    first = hashlib.md5(
                        t[:window].encode("utf-8")).hexdigest()
                    s = (nw - 1) * hop
                    last = hashlib.md5(
                        t[s:s + window].encode("utf-8")).hexdigest()
                else:
                    first = last = ""
                rows.append((int(i), n, nw, first, last))
            yield pd.DataFrame(rows, columns=["doc_id", "n_chars",
                                              "n_windows",
                                              "win_fp_first",
                                              "win_fp_last"])

    return df.select(id_col, text_col).mapInPandas(run,
                                                   AUDIO_WINDOW_SCHEMA)
