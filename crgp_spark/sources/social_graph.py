"""Reference-shaped social-graph source: directory tree ``NNN/MM.tar``
of ``NNN/NNN/friends<UID>.csv`` files (SURVEY.md §2.1 O1; reference
``crgp-lib/src/social_graph/source/tar.rs:59-208``).

Spark-first layout: the tar archives are listed and read DISTRIBUTED via
``spark.read.format("binaryFile")`` (one task per archive — at scale the
unit of parallelism is the archive, exactly the reference's per-file
stream but fanned out), and each archive is unpacked by a vectorized
``mapInPandas`` stage that emits one row per user with the raw friend
list + expected count. Dummy padding, friendless-user dropping and the
selected-users semi-join are DataFrame expressions on top, so Catalyst
can fuse/prune them.

Parity quirks honored (tar.rs):
- name validation: dir ``^\\d{3}$``, tar ``^\\d{2}\\.tar$``, member
  ``^\\d{3}/\\d{3}/friends\\d+\\.csv$`` (``tar.rs:32-53``); everything
  else silently skipped.
- the FIRST line containing ``;`` anywhere in a file is metadata (the
  flag only flips on a ``;`` line — ``tar.rs:466-479``); its 0-based
  field 3 is the expected friend count; later ``;`` lines are parse
  failures.
- unparsable friend lines are skipped (``tar.rs:480-489``).
- dummy friends get ids ``-1..-missing`` PER USER (not globally fresh,
  ``tar.rs:344-352``), only when ``given < expected``.
- users with zero friends after padding are dropped (``tar.rs:190-194``).
- selected-users file: one id per line, unparsable lines skipped
  (``tar.rs:355-381``); graph load keeps only listed users
  (``tar.rs:164-169``).
"""

from __future__ import annotations

import io
import re
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TAR_RE = re.compile(r"^\d{2}\.tar$")
_DIR_RE = re.compile(r"^\d{3}$")
_MEMBER_RE = re.compile(r"^\d{3}/\d{3}/friends(\d+)\.csv$")

#: raw per-user rows emitted by the archive parser
_RAW_SCHEMA = "user long, friends array<long>, expected long"


def _parse_friend_file(data: bytes) -> tuple[int, list[int]]:
    """Mirror of ``parse_friend_file`` (tar.rs:434-505)."""
    expected = 0
    seen_meta = False
    friends: list[int] = []
    for line in io.BytesIO(data).read().decode("utf-8", "replace").splitlines():
        if not seen_meta and ";" in line:
            seen_meta = True
            fields = line.split(";")
            if len(fields) > 3:
                try:
                    expected = int(fields[3])
                    if expected < 0:
                        expected = 0
                except ValueError:
                    pass
            continue
        try:
            friends.append(int(line))
        except ValueError:
            continue  # warn-and-skip in the reference
    return expected, friends


def _unpack_archives(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out_user, out_friends, out_expected = [], [], []
        for blob in pdf["content"]:
            try:
                tf = tarfile.open(fileobj=io.BytesIO(bytes(blob)))
            except tarfile.TarError:
                continue  # unreadable archive: skipped (tar.rs:116-131)
            with tf:
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    m = _MEMBER_RE.match(member.name)
                    if m is None:
                        continue
                    f = tf.extractfile(member)
                    if f is None:
                        continue
                    expected, friends = _parse_friend_file(f.read())
                    out_user.append(int(m.group(1)))
                    out_friends.append(friends)
                    out_expected.append(expected)
        yield pd.DataFrame(
            {
                "user": pd.Series(out_user, dtype="int64"),
                # dtype=object so Arrow maps python lists -> array<long>
                "friends": pd.Series(out_friends, dtype="object"),
                "expected": pd.Series(out_expected, dtype="int64"),
            }
        )


def _users_frame(
    spark: SparkSession,
    path: str,
    pad_with_dummy_users: bool,
    selected_users: DataFrame | None,
) -> DataFrame:
    """Per-user rows ``(user, friends, given, expected, dummies)`` after
    the VIP filter, dummy padding and the friendless drop — the frame
    both the edge view and the load statistics derive from."""
    # Distributed archive scan; name validation mirrors tar.rs:32-53.
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
        .filter(
            F.col("path").rlike(r"/\d{3}/\d{2}\.tar$")
        )
    )
    users = raw.mapInPandas(_unpack_archives, schema=_RAW_SCHEMA)

    if selected_users is not None:
        users = users.join(
            F.broadcast(selected_users.select("user").distinct()),
            "user",
            "left_semi",
        )

    users = users.withColumn("given", F.size("friends").cast("long"))
    if pad_with_dummy_users:
        missing = F.greatest(
            F.col("expected") - F.col("given"), F.lit(0).cast("long")
        ).cast("int")
        users = users.withColumn("dummies", missing.cast("long")).withColumn(
            "friends",
            F.concat(
                "friends",
                # dummy ids -1..-missing per user (tar.rs:344-352)
                F.when(
                    F.col("dummies") > 0,
                    F.transform(
                        F.sequence(F.lit(1), missing), lambda i: (-i).cast("long")
                    ),
                ).otherwise(F.array().cast("array<long>")),
            ),
        )
    else:
        users = users.withColumn("dummies", F.lit(0).cast("long"))

    # friendless users are dropped (tar.rs:190-194); the load counts
    # include only surviving users (tar.rs:196-202)
    return users.filter(F.size("friends") > 0)


def load_social_graph(
    spark: SparkSession,
    path: str,
    pad_with_dummy_users: bool = False,
    selected_users: DataFrame | None = None,
) -> DataFrame:
    """Load a reference-layout social graph directory as an exploded
    ``(user long, friend long)`` edge DataFrame (negative friend ids are
    dummy-pad users, as in ``twitter/mod.rs:18-21``).

    ``selected_users``: optional single-column (``user``) DataFrame; only
    listed users are kept (the reference's VIP filter, ``tar.rs:164-169``).
    """
    return _users_frame(
        spark, path, pad_with_dummy_users, selected_users
    ).select("user", F.explode("friends").alias("friend"))


def load_social_graph_with_stats(
    spark: SparkSession,
    path: str,
    pad_with_dummy_users: bool = False,
    selected_users: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Edges plus the reference's graph-load counts
    (``tar.rs:93-96,196-202`` → ``run.rs:74``): number of users kept,
    given friendships (pre-padding), expected friendships, dummies
    created. One extra aggregate over the per-user frame."""
    users = _users_frame(spark, path, pad_with_dummy_users, selected_users)
    r = users.agg(
        F.count(F.lit(1)).alias("users"),
        F.coalesce(F.sum("given"), F.lit(0)).alias("given"),
        F.coalesce(F.sum("expected"), F.lit(0)).alias("expected"),
        F.coalesce(F.sum("dummies"), F.lit(0)).alias("dummies"),
    ).first()
    counts = {
        "number_of_users": int(r["users"]),
        "number_of_given_friendships": int(r["given"]),
        "number_of_expected_friendships": int(r["expected"]),
        "number_of_dummy_users": int(r["dummies"]),
    }
    edges = users.select("user", F.explode("friends").alias("friend"))
    return edges, counts


def load_selected_users(spark: SparkSession, path: str) -> DataFrame:
    """Selected-users file: one user id per line; unparsable lines are
    skipped (``tar.rs:355-381``)."""
    return (
        spark.read.text(path)
        .select(F.col("value").cast("long").alias("user"))
        .filter(F.col("user").isNotNull())
    )
