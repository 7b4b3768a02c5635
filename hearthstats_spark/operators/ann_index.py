"""Disk-persisted index artifacts (VERDICT r6 item 5): ANN training
outputs, and since round 7 the dedup tier's MinHash signature index
("minhash_sig_index"/"minhash_sig_all", shared by q182/q197 and the
s23/s25/s26 streaming lanes — keyed on the documents table).

q183–q187 each train their quantizers/codebooks from scratch per
run — correct and self-contained, but the four chains repeat ~70%
of their work (q183/q184/q185 share one codebook AND one code
table), and at the 100 TB design point train-once/serve-many is the
only sane shape: the code table IS the index, rebuilt when the
corpus changes, read by every probe (the s24 serving lane already
works this way inside its own directory tree). ``persisted`` makes
that shape the default for the batch queries too: a deterministic
training frame is built once, written to a content-keyed parquet
directory, and every later run — same process or a fresh JVM — reads
it back instead of retraining.

Correctness is unaffected by construction:

- every persisted artifact is a DETERMINISTIC pure function of the
  source table (exact decimal means, min_by with total tie-breaks),
  so read-back equals rebuild bit-for-bit — pinned in
  tests/test_ann_index.py;
- the cache key hashes the artifact name, a version tag, and a
  fingerprint of the source parquet files (relpath, size, mtime_ns
  per file), so regenerated testdata or a parameter change misses
  the cache and retrains rather than serving stale codes; an
  in-place rewrite that PRESERVES size+mtime defeats the fast
  fingerprint, so ``SPARK_GRAFT_ANN_FPMODE=content`` switches to
  hashing file bytes (VERDICT r7 stretch 8 — pinned in
  tests/test_ann_index.py);
- the self-contained retrain lane stays one env var away
  (``SPARK_GRAFT_ANN_CACHE=0``), which is also how the equality
  test exercises both lanes.

Write protocol: build → write to a process-unique temp dir → atomic
``os.rename`` into place; a concurrent builder that loses the race
discards its attempt and reads the winner (both wrote the same
bytes-equal content anyway). A directory is only ever read through
Spark's ``_SUCCESS``-committed listing, so a crashed half-write is
invisible (its rename never happened). The crashed-remnant fallback
re-checks ``_SUCCESS`` in a bounded retry LOOP rather than one
unguarded rmtree+rename (ADVICE r7: a one-shot fallback could
delete a racer's just-committed artifact and then collide).

The default cache root is per-user (uid-keyed, mode 0700, ownership
verified before any read) — a world-writable shared tempdir would
let a pre-planted directory with a matching key be served silently
(ADVICE r7). At 100 TB the cache root is an object-store prefix and
the fingerprint is the table's snapshot/commit id; the local form
keeps the same key discipline at file granularity.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

#: bump to invalidate every persisted artifact (format/semantic change)
_FORMAT_VERSION = 1


def _cache_root() -> str:
    """Artifact store root. The default lives under the shared
    tempdir but is uid-keyed and ownership-checked (see module note);
    an explicit SPARK_GRAFT_ANN_CACHE_DIR is the operator's own
    choice and is used as given."""
    explicit = os.environ.get("SPARK_GRAFT_ANN_CACHE_DIR")
    if explicit:
        return explicit
    root = os.path.join(tempfile.gettempdir(),
                        f"hearthstats_ann_index_uid{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"artifact cache root {root} is owned by uid {st.st_uid}, "
            f"not the current user ({os.getuid()}) — refusing to "
            "serve indexes from a directory another user controls; "
            "set SPARK_GRAFT_ANN_CACHE_DIR or SPARK_GRAFT_ANN_CACHE=0"
        )
    return root


def cache_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_ANN_CACHE", "1") != "0"


def _fp_mode() -> str:
    """"stat" (default: size+mtime_ns per file — fast, correct for
    any normal rewrite) or "content" (sha256 of file bytes — immune
    to an in-place rewrite that preserves size AND mtime, at one
    full read of the source per key computation)."""
    return os.environ.get("SPARK_GRAFT_ANN_FPMODE", "stat")


def _file_token(path: str, rel: str) -> str:
    if _fp_mode() == "content":
        h = hashlib.sha256()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        return f"{rel}:sha256:{h.hexdigest()}"
    st = os.stat(path)
    return f"{rel}:{st.st_size}:{st.st_mtime_ns}"


def _fingerprint(sf_dir: str, table: str) -> str:
    """One token per file under the source table — any regeneration
    of the parquet data changes the key (see _fp_mode)."""
    base = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(base):
        for root, _dirs, files in os.walk(base):
            for f in sorted(files):
                p = os.path.join(root, f)
                parts.append(_file_token(p, os.path.relpath(p, base)))
    elif os.path.isfile(base):
        parts.append(_file_token(base, "."))
    return ";".join(parts)


def artifact_path(sf_dir: str, name: str, table: str = "embeddings",
                  version: int = 1) -> str:
    key = hashlib.sha256(
        f"{name}|fmt{_FORMAT_VERSION}|v{version}|"
        f"{_fingerprint(sf_dir, table)}".encode()
    ).hexdigest()[:16]
    return os.path.join(_cache_root(), f"{name}_{key}")


def persisted(spark: SparkSession, sf_dir: str, name: str, build,
              table: str = "embeddings", version: int = 1) -> DataFrame:
    """The train-once/serve-many lane: return ``build()``'s frame
    from the content-keyed parquet cache, training and committing it
    first if this (source content, name, version) was never built.
    With the cache disabled, exactly ``build()`` — the original
    self-contained plan."""
    if not cache_enabled():
        return build()
    path = artifact_path(sf_dir, name, table, version)
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        build().write.mode("overwrite").parquet(tmp)
        os.makedirs(_cache_root(), exist_ok=True)
        # commit loop (ADVICE r7): rename, and on failure re-check
        # for a committed winner BEFORE touching the target — a
        # one-shot "rmtree then rename" could delete an artifact a
        # racer committed between check and delete, then collide
        # with a second fallback writer. Every competing attempt
        # writes bytes-equal content, so reading any winner is
        # correct; the loop only has to terminate.
        for _attempt in range(16):
            try:
                os.rename(tmp, path)
                break
            except OSError:
                if os.path.isfile(os.path.join(path, "_SUCCESS")):
                    # lost the race to an identical-content winner
                    shutil.rmtree(tmp, ignore_errors=True)
                    break
                # a crashed writer's half-committed remnant (no
                # _SUCCESS — renames are atomic and tmp dirs carry
                # _SUCCESS before commit) blocks the rename: clear
                # it and RETRY; if a racer commits inside this gap,
                # the next iteration reads its _SUCCESS instead of
                # renaming over it
                shutil.rmtree(path, ignore_errors=True)
        else:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"could not commit artifact {path} after 16 attempts")
    return spark.read.parquet(path)
