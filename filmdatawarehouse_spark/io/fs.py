"""Portable filesystem primitives for pointer-commit protocols.

The snapshot MERGE sink (``streaming.merge``), its CDC feed, and the
persisted IVF index (``operators.similarity``) commit work by atomically
flipping a tiny pointer file and pruning superseded version directories.
Until r12 that I/O went through Python ``os``/``shutil``, which only
exists on a driver-local filesystem — the one thing a 1000-executor
cluster reading 100 TB does NOT have (its tables live on HDFS/S3/GCS).
This module routes the same five primitives through the JVM Hadoop
``FileSystem``/``FileContext`` APIs (the pattern ``io.maintenance``
already proved for compaction), so a table path like ``hdfs://...`` or
``s3a://...`` works unchanged.

Atomicity contract (documented per store in SCALING.md): the pointer
flip uses ``FileContext.rename(..., Options.Rename.OVERWRITE)`` —
- local FS: POSIX ``rename(2)`` — atomic overwrite;
- HDFS: atomic within a NameNode (the semantics the protocol was
  designed against);
- S3A and other object stores: rename is COPY+DELETE — not atomic.
  There a reader can observe a missing pointer for the copy window;
  ``read_text_retry`` (r13) bounds that exposure for every pointer
  consumer (MERGE pointer, IVF/IVF-PQ pointer, ingest ledger). A
  SECOND WRITER is fenced by ``io.lease`` (r14): every pointer-flip
  protocol acquires a lease with a fencing token and re-verifies it
  at commit time, so concurrent writers refuse loudly instead of
  interleaving flips — or target a transactional table format.

Everything here is driver-side py4j with O(1) or O(#versions) calls per
commit — never per data file (py4j costs ~5ms per call; the pointer
protocol does a handful per micro-batch, which is noise next to the
snapshot write itself).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _jpath(spark: SparkSession, path: str):
    """(Hadoop Path, FileSystem) for ``path`` under the session's
    Hadoop configuration — resolves the scheme (file://, hdfs://,
    s3a://) exactly as Spark's own reads and writes do."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return p, fs


def exists(spark: SparkSession, path: str) -> bool:
    p, fs = _jpath(spark, path)
    return bool(fs.exists(p))


def is_dir(spark: SparkSession, path: str) -> bool:
    p, fs = _jpath(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def mkdirs(spark: SparkSession, path: str) -> None:
    p, fs = _jpath(spark, path)
    fs.mkdirs(p)


def list_child_dirs(spark: SparkSession, path: str) -> list[str]:
    """Sorted NAMES of the immediate child directories of ``path``
    (empty when the path is absent) — the version-dir enumeration the
    pruners need; one ``listStatus`` call, O(#children) py4j traffic."""
    p, fs = _jpath(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory()
    )


def list_child_files(spark: SparkSession, path: str) -> list[str]:
    """Sorted NAMES of the immediate child FILES of ``path`` (empty when
    the path is absent) — the generation-claim enumeration
    (``io.lease.claim_generation``); one ``listStatus`` call."""
    p, fs = _jpath(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isFile()
    )


def read_text(spark: SparkSession, path: str) -> str | None:
    """The file's UTF-8 content, or None when it does not exist.

    Errors other than not-found re-raise: a transient remote-FS failure
    must fail the caller's batch (which replays), never read as "no
    pointer yet" — the same rule ``streaming.merge`` applies to the
    table read itself."""
    jvm = spark._jvm
    p, fs = _jpath(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines: list[str] = []
        while True:
            ln = reader.readLine()
            if ln is None:
                break
            lines.append(ln)
        return "\n".join(lines)
    finally:
        stream.close()


# Schemes whose rename IS atomic (module banner): an absent/empty read
# there is the truth, never a flip window — retrying can only delay the
# caller. viewfs delegates to hdfs mounts.
_ATOMIC_RENAME_SCHEMES = frozenset({"file", "hdfs", "viewfs"})


def _scheme(spark: SparkSession, path: str) -> str | None:
    """The resolved FileSystem scheme for ``path`` ("file", "hdfs",
    "s3a", ...), or None when resolution itself fails (the caller then
    assumes the conservative non-atomic case). Factored out so tests
    can simulate an object store on a local path."""
    try:
        _, fs_ = _jpath(spark, path)
        return str(fs_.getScheme())
    except Exception:  # noqa: BLE001 — detection must never mask the read
        return None


def read_text_retry(
    spark: SparkSession,
    path: str,
    attempts: int = 3,
    base_delay_s: float = 0.05,
) -> str | None:
    """``read_text`` with bounded retry on ABSENT-or-EMPTY — the pointer
    consumers' defense for stores where ``rename(OVERWRITE)`` is
    copy+delete (module banner: S3A and friends). There a reader can
    observe the pointer missing — or half-copied — for the flip window;
    a single raw read would misreport an established table as "no
    commits yet". Retries cover ONLY that window: any other error
    re-raises immediately (``read_text``'s contract), and after
    ``attempts`` reads the last observation is returned, so a genuinely
    new table still reads as absent (exponential backoff: 0.05/0.1 s
    between the 3 reads, orders of magnitude past a small pointer
    file's copy window).

    On ATOMIC-rename schemes (local/HDFS/viewfs) an absent read is the
    truth and the retry can never help, so it is skipped (ADVICE r13):
    a legitimately-first read of a new table's pointer costs one read,
    not a ~0.15 s backoff. Retries are a READER-side mitigation; a
    second WRITER is fenced by ``io.lease``."""
    import time

    text = read_text(spark, path)
    if text is not None and text.strip():
        return text
    if _scheme(spark, path) in _ATOMIC_RENAME_SCHEMES:
        return text  # absence is the truth here, not a flip window
    for i in range(1, max(1, attempts)):
        time.sleep(base_delay_s * (2 ** (i - 1)))
        text = read_text(spark, path)
        if text is not None and text.strip():
            return text
    return text


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Atomically (re)place ``path`` with ``text``: write a sibling temp
    file, then ``FileContext.rename(OVERWRITE)`` it onto the target.
    See the module banner for what "atomic" means per store.

    The temp name is unique per write (ADVICE r14): the lease protocol
    makes concurrent rewrites of ONE path routine (heartbeat vs
    takeover, same-owner re-acquire), and a SHARED staging name let two
    writers interleave create/write/rename and rename a body neither
    intended. A unique name means each rename moves exactly the bytes
    its writer staged; losers' temp files are deleted on failure (and a
    crash-leaked temp is plain garbage, never read by any protocol)."""
    import uuid as _uuid

    jvm = spark._jvm
    p, fs = _jpath(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{path}.tmp-{_uuid.uuid4().hex}"
    )
    try:
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            spark._jsc.hadoopConfiguration()
        )
        gw = spark.sparkContext._gateway
        ren = jvm.org.apache.hadoop.fs.Options.Rename
        opts = gw.new_array(ren, 1)
        opts[0] = ren.OVERWRITE
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(p), opts)
    except BaseException:
        try:
            fs.delete(tmp, False)
        except Exception:  # noqa: BLE001 — cleanup must not mask the error
            pass
        raise


def create_text_exclusive(
    spark: SparkSession, path: str, text: str
) -> bool:
    """Create ``path`` holding ``text`` IFF it does not already exist;
    False when it does (``FileSystem.create(overwrite=false)``). This is
    the lease-acquisition primitive (``io.lease``): atomic create-if-
    absent on HDFS (NameNode-serialized); on the local FS it is a
    check-then-create inside the Hadoop client — fine for a driver-side
    protocol; on object stores without conditional PUT two racers can
    both "succeed" with last-write-wins, which is exactly why the lease
    protocol NEVER trusts acquisition alone: the fencing token is
    re-verified at commit time, and only the token matching the lease
    file's current content commits."""
    p, fs = _jpath(spark, path)
    try:
        out = fs.create(p, False)
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        name = type(e).__name__
        java = str(getattr(e, "java_exception", "")) or str(e)
        if "AlreadyExists" in name or "AlreadyExists" in java:
            return False
        raise
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


# Not-found classification (ADVICE r15): classify by the JAVA EXCEPTION
# CLASS along the cause chain, not by substring-matching the rendered
# message — a store surfacing deletion as a raw NoSuchKey/404 that the
# Hadoop connector did not translate to FileNotFoundException must still
# land in the "gone" branch (otherwise set_mtime_now returns False and
# the heartbeat's content-rewrite fallback resurrects a deleted lease).
# Class-name markers cover java.io.FileNotFoundException and its Hadoop
# subclasses, java.nio NoSuchFileException, and S3-style NoSuchKey /
# *NotFoundException connector classes; the message fallback catches
# connectors that wrap the store error in a generic IOException but
# preserve the store's error code in the text.
_NOT_FOUND_CLASS_MARKERS = ("FileNotFound", "NoSuchFile", "NoSuchKey", "NotFound")
_NOT_FOUND_MSG_MARKERS = ("FileNotFound", "NoSuchKey", "404 Not Found", "Status Code: 404")


def _is_not_found(e: Exception) -> bool:
    """True when ``e`` (a py4j-surfaced Java error or a plain Python
    exception) means the path does not exist, classified primarily by
    exception CLASS names along the Java cause chain."""
    class_names = [type(e).__name__]
    je = getattr(e, "java_exception", None)
    msg = ""
    if je is not None:
        try:
            cur = je
            for _ in range(8):  # bounded cause-chain walk
                if cur is None:
                    break
                class_names.append(str(cur.getClass().getName()))
                cur = cur.getCause()
        except Exception:  # noqa: BLE001 — classification must not raise
            pass
        try:
            msg = str(je)
        except Exception:  # noqa: BLE001
            msg = ""
    else:
        msg = str(e)
    joined = " ".join(class_names)
    if any(m in joined for m in _NOT_FOUND_CLASS_MARKERS):
        return True
    return any(m in msg for m in _NOT_FOUND_MSG_MARKERS)


def mtime_ms(spark: SparkSession, path: str) -> int | None:
    """The file's modification time in epoch milliseconds, or None when
    it does not exist (the lease-expiry clock — see ``io.lease`` for
    why TTL is advisory and the fencing token is the correctness
    mechanism). The exists→getFileStatus pair is a TOCTOU (ADVICE r14):
    a lease released between the two calls must read as absent — the
    caller's retry branch — not escape as a raw py4j not-found error,
    so not-found from the stat itself is classified and folded into
    None. Any other error re-raises."""
    p, fs = _jpath(spark, path)
    if not fs.exists(p):
        return None
    try:
        return int(fs.getFileStatus(p).getModificationTime())
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        if _is_not_found(e):
            return None
        raise


def set_mtime_now(spark: SparkSession, path: str) -> bool | None:
    """Refresh ``path``'s modification time to the current wall clock
    WITHOUT touching its content (``FileSystem.setTimes``). Tri-state
    (r15 review — the two failure kinds demand OPPOSITE reactions):

    - ``True``  — refreshed;
    - ``None``  — the file is GONE (deleted under us — e.g. an operator
      ``break_lease``): the caller must STOP, never recreate. Folding
      this into False let the heartbeat's content-rewrite fallback
      resurrect a broken lease forever on stores that do support
      setTimes;
    - ``False`` — the store cannot setTimes (object stores with
      immutable PUT metadata): the caller may fall back to a rewrite.

    This is the heartbeat's preferred refresh
    (``io.lease.start_heartbeat``): a takeover's token can never be
    clobbered by a refresh that writes no bytes."""
    import time as _time

    p, fs = _jpath(spark, path)
    try:
        fs.setTimes(p, int(_time.time() * 1000), -1)
        return True
    except Exception as e:  # noqa: BLE001 — classify, then decide
        if _is_not_found(e):
            return None
        return False


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Best-effort delete; False when the path was already absent."""
    p, fs = _jpath(spark, path)
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Move ``src`` to ``dst`` (no overwrite — ``FileSystem.rename``
    refuses an existing destination on most stores). Raises on failure
    instead of returning the API's silent False: a failed swap step must
    stop the caller's protocol, not let it delete the surviving copy.
    Atomicity per store is the module-banner contract."""
    s, fs = _jpath(spark, src)
    d, _ = _jpath(spark, dst)
    if not fs.rename(s, d):
        raise OSError(f"rename failed: {src} -> {dst}")
