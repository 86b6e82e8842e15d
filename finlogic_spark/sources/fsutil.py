"""Hadoop FileSystem helpers (engine-scope addition): the one sanctioned
way to list/delete/rename data files from the driver.

Everything here goes through ``org.apache.hadoop.fs.FileSystem`` — the
same abstraction Spark's committers use — so callers (the streaming
upsert sink's snapshot store, the compaction operator) behave
identically on ``file:``, ``hdfs:`` and ``s3a:`` URIs. ``os.listdir``
on the driver is NOT equivalent: on a real cluster the driver's POSIX
view is not the store.
"""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """(FileSystem, Path, jvm) for ``path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(uri, bytes) of the parquet data files directly under ``path``,
    sorted by file name. Name order is write order for Spark output
    (part-00000 < part-00001 < ...), which for a range-partitioned
    write is also clustering order — consumers that bin-pack
    consecutive files preserve clustering by relying on this sort."""
    fs, jpath, _ = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() or name.startswith(("_", ".")):
            continue
        if not name.endswith(".parquet"):
            continue
        out.append((status.getPath().toString(), int(status.getLen())))
    return sorted(out, key=lambda t: t[0].rsplit("/", 1)[-1])


def delete_path(spark, path: str, recursive: bool = True) -> bool:
    fs, jpath, _ = hadoop_fs(spark, path)
    return bool(fs.delete(jpath, recursive))


def rename_path(spark, src: str, dest: str) -> bool:
    fs, jsrc, jvm = hadoop_fs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dest)))
