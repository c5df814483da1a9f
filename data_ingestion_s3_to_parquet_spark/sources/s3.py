"""S3 object source (reference A1 + A7).

Reference behavior (``/root/reference/src/main.rs:172-208``): stream one
S3 object chunk-at-a-time to a local file, fsync per chunk, return the
byte count; plus the warm-path short-circuit (``main.rs:36``) that skips
the download when the target already exists locally.

Spark-first note: this driver-side fetch exists for strict parity and
for pulling *small archive* objects (zip is not splittable anyway). For
everything else the engine reads ``s3a://`` URIs directly inside
``spark.read`` — the Hadoop S3A connector does ranged parallel reads
across executors, which obsoletes the manual chunk loop (and the
fsync-per-chunk durability/throughput tradeoff disappears: S3A streams
to the task, not to a local file).

boto3 is not part of this environment's baked-in set, so the import is
gated; :class:`S3NotAvailable` signals the capability cleanly.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

try:  # pragma: no cover - exercised only where boto3 exists
    import boto3  # type: ignore

    HAVE_BOTO3 = True
except Exception:  # pragma: no cover
    boto3 = None
    HAVE_BOTO3 = False


class S3NotAvailable(RuntimeError):
    """boto3 (or credentials) missing — S3 fetch cannot run here."""


def fetch_s3(
    bucket: str,
    key: str,
    destination: str,
    *,
    chunk_size: int = 8 * 1024 * 1024,
    skip_if_exists: bool = True,
) -> int:
    """Stream ``s3://bucket/key`` to ``destination``; return bytes written.

    Mirrors the reference's chunked get (main.rs:189-205) including the
    exists short-circuit (main.rs:36-42). fsync-per-chunk is *not*
    reproduced: one fsync at close gives the same durability point at a
    fraction of the syscall cost.
    """
    if skip_if_exists and os.path.exists(destination):
        logger.info("destination %s exists; skipping S3 fetch", destination)
        return 0
    if not HAVE_BOTO3:
        raise S3NotAvailable("boto3 not installed in this environment")
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    client = boto3.client("s3")
    total = 0
    obj = client.get_object(Bucket=bucket, Key=key)
    with open(destination, "wb") as fh:
        for chunk in obj["Body"].iter_chunks(chunk_size=chunk_size):
            fh.write(chunk)
            total += len(chunk)
        fh.flush()
        os.fsync(fh.fileno())
    logger.info("fetched s3://%s/%s -> %s (%d bytes)", bucket, key, destination, total)
    return total


def s3a_uri(bucket: str, key: str) -> str:
    """The scale path: hand Spark the object URI and let S3A do the I/O."""
    return f"s3a://{bucket}/{key}"
