package graft.batch

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Driver-side filesystem operations for store maintenance (commit logs,
  * segment sweeps, snapshot retention, clustered-layout listing), on the
  * Hadoop `FileSystem` API so the SAME code runs on the local FS in tests
  * and on HDFS / S3A / GCS on a cluster — the reference's equivalent layer
  * is HDFS-native (summingbird-scalding/.../store/VersionedBatchStore
  * .scala:62-143, summingbird-batch-hadoop HDFSState.scala).
  *
  * Path resolution follows Hadoop semantics: a bare `/data/store` resolves
  * against `fs.defaultFS` (the local FS in tests, the cluster FS in a real
  * deployment); a qualified `hdfs://…` or `s3a://…` URI selects its scheme
  * explicitly. The Hadoop `Configuration` comes from the active
  * `SparkSession` when one exists (so `spark.hadoop.*` settings — S3A
  * credentials, endpoint overrides — apply to maintenance too), falling
  * back to a default `Configuration` for session-less callers.
  *
  * Everything here is small-metadata work (a commit log of a few hundred
  * bytes, a directory listing of at most a few thousand entries) —
  * intentionally driver-side, never a Spark job.
  *
  * Per-filesystem guarantees of the two primitives store consistency
  * rests on (the lease layers on top are in [[WriterLease]]):
  *
  * {{{
  * scheme       writeAtomic (commit-log flip)       createExclusive (lease)
  * -----------  ----------------------------------  -------------------------------
  * file / hdfs  atomic rename — EXACT               create(overwrite=false) — EXACT
  * s3a ≥ 3.4.1  copy+delete: old-or-new, never      conditional PUT If-None-Match
  *              torn; AND the flip upgrades to a    (fs.s3a.create.conditional
  *              conditional PUT (If-Match on the    .enabled, default on) — EXACT
  *              read etag) once a [[CasBackend]]
  *              is installed — two same-instant
  *              flips then resolve EXACTLY: one
  *              wins, one loses loudly
  * older s3a /  same old-or-new object visibility   BEST-EFFORT: same-instant
  * gcs          (copy materializes on completion)   creators can both "succeed";
  *                                                  caught by the lease read-back
  *                                                  + commit-time re-verify
  * }}}
  *
  * On every scheme the flip is a SINGLE object, so "atomic" vs "old-or-
  * new object visibility" is a latency difference, not a torn-write
  * risk; the behaviors that genuinely vary are lease exclusivity (backstopped
  * by [[WriterLease]]'s read-back + re-verify layers) and flip contention,
  * closed exactly where the store offers conditional writes (the
  * [[CasBackend]] hook, law-pinned in StoreFsSpec against a mock CAS store).
  */
object StoreFs {

  /** Upper bound on a single state file read by [[readBytes]] — commit
    * logs, locks, markers are a few hundred bytes to a few KB; even a
    * long-lived store's revoked-id digest log stays far below this. The
    * bound exists to turn a mis-pointed read (a parquet payload, a
    * runaway log) into a loud error instead of an OOM buffering the
    * whole file driver-side. Raise with `-Dgraft.state.maxBytes=<n>` if
    * a legitimate state file ever approaches it.
    */
  val DefaultMaxStateFileBytes: Long = 64L << 20
  def maxStateFileBytes: Long =
    sys.props.get("graft.state.maxBytes").map(_.toLong)
      .getOrElse(DefaultMaxStateFileBytes)

  /** Conditional single-object overwrite — the compare-and-swap shape
    * object stores expose as a conditional PUT (S3 `If-Match` on the read
    * ETag / `If-None-Match: *`; available through S3A on Hadoop ≥ 3.4.1).
    * `expected` is the content the caller READ before computing `bytes`
    * (None = the object must not exist yet); the write lands only if the
    * object still matches, so two same-instant commit-log flips resolve
    * exactly: one wins, one returns false and fails loudly upstream.
    */
  trait CasBackend {
    def compareAndSwap(path: String, expected: Option[Array[Byte]],
        bytes: Array[Byte]): Boolean
  }

  /** Deployment hook: install the filesystem's conditional-write
    * implementation (an S3A etag-conditional PUT adapter in production;
    * an in-memory mock in the law suite). With none installed the flip
    * stays [[writeAtomic]]'s rename — atomic single-object on HDFS/local,
    * old-or-new on object stores, backstopped by the [[WriterLease]]
    * layers. The backend is engine-global: one driver mutates a store at
    * a time (the lease enforces it), so a single hook suffices.
    */
  @volatile private var casBackend: Option[CasBackend] = None
  def installCasBackend(b: CasBackend): Unit = { casBackend = Some(b) }
  def clearCasBackend(): Unit = { casBackend = None }
  def currentCasBackend: Option[CasBackend] = casBackend

  /** Default-on CAS (round 17): every driver entry point
    * ([[BatchDriver.runIncremental]], `graft.Verify`, `graft.Bench`)
    * calls this before the first store mutation, so the conditional
    * commit-log flip is the DEFAULT discipline — forgetting the wiring
    * recipe no longer silently downgrades to the rename path with lease
    * backstops (the reference's analogous commit, HDFSState's versioned
    * dir, is always-on: summingbird-batch-hadoop/.../HDFSState.scala:
    * 80-150). Never overrides an explicitly installed backend (the law
    * suites install mocks), and is an idempotent no-op once installed.
    * Opt out (back to rename + lease) with `-Dgraft.cas.default=off` or
    * env `SPARK_GRAFT_CAS_DEFAULT=off` — for filesystems whose exclusive
    * create is known inexact AND whose rename is atomic, where the lease
    * alone is the better residual.
    */
  private var defaultCasOptOutWarned = false
  def ensureDefaultCasBackend(): Unit = synchronized {
    val optOut = sys.props.get("graft.cas.default")
      .orElse(sys.env.get("SPARK_GRAFT_CAS_DEFAULT"))
      .exists(v => v.equalsIgnoreCase("off") || v.equalsIgnoreCase("false"))
    if (optOut) {
      // warn ONCE, and only when the opt-out actually leaves the rename
      // path in effect — an explicitly installed backend still handles
      // every flip, and a streaming driver calls this once per batch
      if (casBackend.isEmpty && !defaultCasOptOutWarned) {
        defaultCasOptOutWarned = true
        System.err.println("[graft] default CAS backend opted out " +
          "(graft.cas.default=off) — commit-log flips use rename + lease")
      }
    } else if (casBackend.isEmpty) {
      casBackend = Some(new HadoopCasBackend())
      System.err.println("[graft] HadoopCasBackend installed (default-on): " +
        "commit-log flips are compare-and-swap; opt out with " +
        "-Dgraft.cas.default=off")
    }
  }

  /** Hadoop conf of the active Spark session (carries `spark.hadoop.*`
    * overrides), or a plain default when no session is active.
    */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsOf(p: Path): FileSystem = {
    val fs = p.getFileSystem(hadoopConf)
    // raw local FS for anything that RESOLVES to the `file` scheme:
    // StoreFs artifacts are tiny single-object metadata (commit logs,
    // locks, markers) whose flip discipline checksum sidecars would tear
    // — a data/crc PAIR cannot rename atomically, so a stale sidecar
    // next to an atomically-flipped log would fail every subsequent
    // checksummed read. The raw FS has no sidecars and its rename is
    // rename(2). Parquet payloads never go through here. Scheme-based,
    // not class-based: an active Spark session rebinds fs.file.impl to
    // Hive's ProxyLocalFileSystem (still scheme `file`, still the local
    // disk), while a law suite's deliberately non-exclusive mock FS
    // keeps its own scheme — and with it, its own semantics.
    if ("file" == fs.getUri.getScheme)
      FileSystem.getLocal(hadoopConf).getRawFileSystem
    else fs
  }

  /** The genuinely-local raw FS (exact class — a subclassing mock keeps
    * its own create/rename semantics): where [[writeAtomic]] and
    * [[createExclusive]] use NIO's rename(2)/O_EXCL instead of the
    * Hadoop local paths (delete-then-rename overwrite; check-then-act
    * create plus a forked path-re-resolving chmod).
    */
  private def isPlainRawLocal(fs: FileSystem): Boolean =
    fs.getClass == classOf[org.apache.hadoop.fs.RawLocalFileSystem]

  /** Best-effort removal of a `.name.crc` checksum sidecar next to a file
    * the raw-local paths just (re)wrote. A store written by an OLDER
    * checksummed-LocalFileSystem build carries sidecars; the raw-FS flip
    * updates the data file but not the sidecar, so a reader going back
    * through a checksummed local FS (older build, external tooling) would
    * fail verification on the stale pair. Deleting the sidecar restores
    * the no-checksum state both readers handle.
    */
  private def dropCrcSidecar(dst: Path): Unit = {
    val dir = dst.toUri.getPath
    val crc = java.nio.file.Paths.get(dir).resolveSibling(s".${dst.getName}.crc")
    scala.util.Try(java.nio.file.Files.deleteIfExists(crc))
    ()
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsOf(p).exists(p)
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsOf(p).mkdirs(p)
    ()
  }

  /** Directory listing; empty when the path does not exist (the common
    * "store not bootstrapped yet" case must not throw).
    */
  def listStatus(path: String): Array[FileStatus] = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p)) Array.empty else fs.listStatus(p)
  }

  /** Exact row count of one parquet file from its FOOTER — a driver-side
    * metadata read, never a Spark job (round 21): the segment writers
    * derive per-partition occupancy stats of files they JUST wrote, and
    * a footer read replaces what was previously a full scan job per
    * segment write. Footer record counts are exact by the format.
    */
  def parquetRowCount(file: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(file), hadoopConf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  def readBytes(path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = fsOf(p)
    val in = fs.open(p)
    try {
      // read to EOF from the ONE open stream — never a second path
      // resolution for the length: under a concurrent atomic overwrite,
      // open() and getFileStatus() can land on DIFFERENT versions of the
      // file, turning an old-or-new flip into an EOF error or a torn
      // prefix read (caught by the racing-reader hammer law)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        bos.write(buf, 0, n)
        require(bos.size <= maxStateFileBytes,
          s"$path exceeds the ${maxStateFileBytes}-byte state-file bound " +
            "(StoreFs.maxStateFileBytes) — state files are small metadata; " +
            "a legitimate file this large can raise -Dgraft.state.maxBytes")
        n = in.read(buf)
      }
      bos.toByteArray
    } finally in.close()
  }

  /** Atomic overwrite: write a temp file in the target's directory, then
    * flip it over the destination — rename(2) via NIO `ATOMIC_MOVE` on
    * the local FS, `FileContext.rename(OVERWRITE)` elsewhere (HDFS's
    * AbstractFileSystem overrides the overwrite rename with the atomic
    * rename2 RPC). On S3A the rename is copy+delete (not atomic but
    * still all-or-nothing per object: readers see the old or the new
    * commit log, never a torn write, because the copy materializes only
    * on completion).
    *
    * The local scheme MUST NOT go through FileContext: Hadoop's default
    * `AbstractFileSystem.renameInternal(src, dst, overwrite = true)` —
    * which the local FS inherits — DELETES the destination and then
    * renames, so a reader racing the flip observes the commit log
    * MISSING and resolves an existing store as empty (caught by the
    * stored-tier flip race law; law-pinned in StoreFsSpec's
    * old-or-new-never-missing hammer).
    */
  def writeAtomic(path: String, bytes: Array[Byte]): Unit = {
    val dst = new Path(path)
    val fs = fsOf(dst)
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${dst.getName}.${System.nanoTime}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (isPlainRawLocal(fs)) {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      dropCrcSidecar(dst)
    } else
      FileContext.getFileContext(dst.toUri, hadoopConf)
        .rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** Atomically move `src` to `dst` (dst must not exist). Returns false
    * when the source is already gone — the caller lost a rename race
    * (exactly one of N same-instant renamers of one file wins on an
    * atomic-rename FS). Used by [[WriterLease]]'s stale-lease break: a
    * rename either moves the WHOLE old lock or fails, so two breakers
    * can never both believe they cleared the way (delete+create could
    * interleave so both read their own fresh lock back). On object
    * stores rename is copy+delete (non-atomic) — same best-effort
    * caveat as [[createExclusive]], backstopped by the lease layers.
    */
  def renameExclusive(src: String, dst: String): Boolean = {
    val s = new Path(src)
    val d = new Path(dst)
    try {
      FileContext.getFileContext(s.toUri, hadoopConf).rename(s, d)
      true
    } catch {
      case _: java.io.FileNotFoundException => false
    }
  }

  /** Create `path` with `bytes` ONLY if it does not already exist —
    * `FileSystem.create(overwrite = false)`, the atomic create-if-absent
    * primitive lock files are built on (exact on HDFS and the local FS;
    * object stores without conditional writes give best-effort
    * semantics). Throws if the file already exists.
    */
  def createExclusive(path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (isPlainRawLocal(fs)) {
      // O_CREAT|O_EXCL in ONE syscall — genuinely exact create-if-absent
      // (Hadoop's local create() is a check-then-act exists probe, and
      // worse, it forks a post-create `chmod` that re-resolves the PATH:
      // a concurrent stale-break rename yanking the nascent lock away
      // mid-create kills the legitimate winner with an ExitCodeException
      // — observed in the N-breaker race law)
      val nioP = java.nio.file.Paths.get(p.toUri.getPath)
      Option(nioP.getParent)
        .foreach(d => { java.nio.file.Files.createDirectories(d); () })
      java.nio.file.Files.write(nioP, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      dropCrcSidecar(p)
    } else {
      val out = fs.create(p, false)
      try out.write(bytes) finally out.close()
    }
  }

  def deleteRecursive(path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Modification time of `path` in epoch millis; 0 when absent. Used by
    * age-gated sweeps (deletion grace periods).
    */
  def modificationTime(path: String): Long = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
  }

  /** Marker file name used by [[sweepDir]]'s two-phase delete. */
  val TombstoneName = "_graft_tombstone"

  /** Delete a DEAD directory (superseded snapshot / swept segment),
    * optionally behind a deletion grace: `graceMs <= 0` deletes
    * immediately; a positive grace TOMBSTONES the directory on the first
    * call (its data stays readable for any in-flight scan that resolved
    * the old listing) and deletes it only on a later call that finds the
    * tombstone older than the grace. Callers invoke this on their
    * maintenance cadence, so tombstones age out on that cadence.
    */
  def sweepDir(dir: String, graceMs: Long,
      now: Long = System.currentTimeMillis()): Unit = {
    if (graceMs <= 0L) deleteRecursive(dir)
    else {
      val tomb = s"$dir/$TombstoneName"
      val marked = modificationTime(tomb)
      if (marked == 0L) writeAtomic(tomb, now.toString.getBytes("UTF-8"))
      else if (now - marked > graceMs) deleteRecursive(dir)
    }
  }

  /** Remove a stale tombstone from a directory being (re-)committed live
    * — a resurrected id must not inherit the old marker, or its next
    * grace window would be cut short.
    */
  def clearTombstone(dir: String): Unit =
    deleteRecursive(s"$dir/$TombstoneName")

  /** Whether `path` holds at least one parquet file anywhere below it — a
    * segment written from an empty batch has none (only write markers)
    * and readers must skip it or schema inference fails.
    */
  def hasParquetFiles(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    def go(d: Path): Boolean = {
      val kids = fs.listStatus(d)
      kids.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")) ||
        kids.exists(s => s.isDirectory && go(s.getPath))
    }
    fs.exists(p) && go(p)
  }
}
