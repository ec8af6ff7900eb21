"""WebDataset shard sink/source: determinism, adjacency, grouping
rule, and loud failure on incomplete samples."""

from __future__ import annotations

import io
import tarfile

import pandas as pd
import pytest

from mechaml_spark import webdataset as wd


def _pairs_df(spark, n=6, partitions=2):
    rows = [
        {"key": f"img{i:04d}", "image": bytes([i] * 10),
         "caption": f"cap {i}"}
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(partitions)


def test_shard_roundtrip_and_layout(spark):
    df = _pairs_df(spark)
    shards = wd.to_webdataset_shards(df).collect()
    assert sum(s["n_samples"] for s in shards) == 6
    # member layout: sorted keys, caption adjacent to its image,
    # deterministic metadata
    for s in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(s["shard"]))) as tar:
            names = [m.name for m in tar.getmembers()]
            keys = [n.split(".")[0] for n in names[::2]]
            assert keys == sorted(keys)
            for j in range(0, len(names), 2):
                assert names[j].endswith(".jpg")
                assert names[j + 1] == names[j][:-4] + ".txt"
            assert all(
                m.mtime == 0 and m.uid == 0 and m.uname == ""
                for m in tar.getmembers()
            )
    back = wd.parse_webdataset_shards(
        spark.createDataFrame(
            pd.DataFrame([{"shard": bytes(s["shard"]),
                           "n_samples": s["n_samples"]} for s in shards])
        )
    ).collect()
    got = sorted((r["key"], bytes(r["image"]), r["caption"]) for r in back)
    assert got == [
        (f"img{i:04d}", bytes([i] * 10), f"cap {i}") for i in range(6)
    ]


def test_shards_byte_deterministic(spark):
    df = _pairs_df(spark, partitions=1)
    a = wd.to_webdataset_shards(df).collect()[0]["shard"]
    b = wd.to_webdataset_shards(df).collect()[0]["shard"]
    assert bytes(a) == bytes(b)


def test_missing_caption_raises(spark):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        info = tarfile.TarInfo("orphan.jpg")
        info.size = 3
        tar.addfile(info, io.BytesIO(b"abc"))
    df = spark.createDataFrame(
        pd.DataFrame([{"shard": buf.getvalue(), "n_samples": 1}])
    )
    with pytest.raises(Exception, match="missing"):
        wd.parse_webdataset_shards(df).collect()
