"""WebDataset tar-shard sink/source — the delivery format the
image-caption training stack actually consumes (LAION et al. ship
``{key}.jpg`` + ``{key}.txt`` pairs inside sequential ``.tar``
shards; loaders stream them sample-at-a-time with no random access).

Spark-first shape: ONE shard per input partition (`mapInPandas`, the
same sharding convention as the WARC sink) — at 10^10 pairs you
``repartition(n_shards)`` first and each shard streams out of one
task; bytes never shuffle after the repartition.  Shards are byte-
deterministic: entries sorted by key, mtime pinned to 0, uid/gid 0,
ustar format — two runs over the same partition produce identical
tars (retry-stable, diffable).

The reference (mechaml) has no corpus-output layer; this is engine
breadth for the north rule's image+caption corpus (SURVEY §2.12).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SHARD_T = T.StructType(
    [
        T.StructField("shard", T.BinaryType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

SAMPLE_T = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("caption", T.StringType()),
    ]
)


def _add(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(data))


def to_webdataset_shards(
    df: DataFrame,
    key_col: str = "key",
    image_col: str = "image",
    caption_col: str = "caption",
    image_ext: str = "jpg",
) -> DataFrame:
    """Sink: one deterministic ustar shard per partition; each row
    becomes adjacent ``{key}.{image_ext}`` + ``{key}.txt`` members
    (adjacency is the format's contract — loaders group by key
    prefix as they stream)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for key, img, cap in zip(
                pdf[key_col], pdf[image_col], pdf[caption_col]
            ):
                rows.append((str(key), bytes(img), str(cap)))
        if not rows:
            return
        rows.sort(key=lambda r: r[0])
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for key, img, cap in rows:
                _add(tar, f"{key}.{image_ext}", img)
                _add(tar, f"{key}.txt", cap.encode("utf-8"))
        yield pd.DataFrame(
            [{"shard": buf.getvalue(), "n_samples": len(rows)}]
        )

    return df.mapInPandas(run, schema=SHARD_T)


def parse_webdataset_shards(
    seg_df: DataFrame, shard_col: str = "shard"
) -> DataFrame:
    """Source: stream samples back out of shards — members grouped
    by key prefix (extension split on the FIRST dot of the basename,
    the WebDataset rule, so ``key.seg.0.jpg``-style dotted keys are
    out of scope and flagged by a loud ValueError on caption-less
    groups)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard in pdf[shard_col]:
                groups: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(shard)), mode="r"
                ) as tar:
                    for m in tar.getmembers():
                        key, _, ext = m.name.partition(".")
                        if key not in groups:
                            groups[key] = {}
                            order.append(key)
                        groups[key][ext] = tar.extractfile(m).read()
                for key in order:
                    g = groups[key]
                    cap = g.pop("txt", None)
                    if cap is None or not g:
                        raise ValueError(
                            f"webdataset sample {key!r} missing "
                            "caption or image member"
                        )
                    (_ext, img), = g.items()
                    rows.append(
                        {
                            "key": key,
                            "image": img,
                            "caption": cap.decode("utf-8"),
                        }
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["key", "image", "caption"]
                )

    return seg_df.mapInPandas(run, schema=SAMPLE_T)
