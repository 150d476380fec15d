"""Object-store (S3) input parity.

The reference reads both of its sources straight from S3
(``tar.rs:211-342``, ``get.rs:80-113``) with credentials resolved from
the environment (``aws_s3.rs:9-16``: ``AWS_ACCESS_KEY_ID`` /
``AWS_SECRET_ACCESS_KEY`` / region).  In Spark the equivalent is not a
second code path per source — every reader in ``sources/`` already
accepts any Hadoop-filesystem URI (``s3a://bucket/prefix``, ``file://``,
``hdfs://``, …) because ``spark.read`` resolves the scheme through the
Hadoop FileSystem API.  What remains is the credential/endpoint
plumbing, which this module maps from the same environment variables
onto the ``fs.s3a.*`` Hadoop configuration.

No network or AWS SDK is touched here: the function only sets
configuration, so it is fully testable offline (and the scheme-agnostic
path contract is exercised in tests via ``file://`` URIs, the one
remote-style scheme available in-sandbox).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: env var -> fs.s3a key, mirroring the reference's resolution order
_ENV_MAP = {
    "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
    "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
    "AWS_SESSION_TOKEN": "fs.s3a.session.token",
    "AWS_ENDPOINT_URL": "fs.s3a.endpoint",
    "AWS_REGION": "fs.s3a.endpoint.region",
}


def configure_s3(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    session_token: str | None = None,
    endpoint: str | None = None,
    region: str | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Set ``fs.s3a.*`` on the session's Hadoop configuration from
    explicit arguments, falling back to the standard AWS environment
    variables (the reference's credential source, ``aws_s3.rs:9-16``).

    Returns the key→value mapping that was applied.  With a session
    token present the temporary-credentials provider is selected, as the
    AWS SDK does implicitly.  ``extra`` passes through arbitrary
    ``fs.s3a.*`` settings (e.g. ``path.style.access`` for MinIO)."""
    explicit = {
        "fs.s3a.access.key": access_key,
        "fs.s3a.secret.key": secret_key,
        "fs.s3a.session.token": session_token,
        "fs.s3a.endpoint": endpoint,
        "fs.s3a.endpoint.region": region,
    }
    applied: dict[str, str] = {}
    for env, key in _ENV_MAP.items():
        val = os.environ.get(env)
        if val and explicit.get(key) is None:
            applied[key] = val
    for key, val in explicit.items():
        if val is not None:
            applied[key] = val
    if "fs.s3a.session.token" in applied:
        applied.setdefault(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider",
        )
    for key, val in (extra or {}).items():
        applied[key] = val

    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for key, val in applied.items():
        conf.set(key, val)
    return applied
