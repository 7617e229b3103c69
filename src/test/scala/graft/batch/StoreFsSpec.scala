package graft.batch

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Hadoop-FileSystem-backed store maintenance layer. These run
  * against the Hadoop LOCAL filesystem — the same `FileSystem` code path a
  * cluster deployment exercises on HDFS/S3A, just with `file://` resolution
  * (the point of the port: one implementation, no local/cluster fork).
  */
class StoreFsSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_storefs_").toString

  test("writeAtomic creates, overwrites, and leaves no temp files behind") {
    val dir = tmpDir()
    val f = s"$dir/sub/_state.json"
    StoreFs.writeAtomic(f, "v1".getBytes("UTF-8"))
    assert(new String(StoreFs.readBytes(f), "UTF-8") == "v1")
    StoreFs.writeAtomic(f, "v2-longer".getBytes("UTF-8"))
    assert(new String(StoreFs.readBytes(f), "UTF-8") == "v2-longer")
    val leftovers = StoreFs.listStatus(s"$dir/sub")
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files not cleaned: ${leftovers.mkString(",")}")
    StoreFs.deleteRecursive(dir)
  }

  test("listStatus on a missing path is empty, not an exception") {
    assert(StoreFs.listStatus(s"${tmpDir()}/never-created").isEmpty)
  }

  test("exists / mkdirs / deleteRecursive round-trip") {
    val dir = tmpDir()
    val nested = s"$dir/a/b/c"
    assert(!StoreFs.exists(nested))
    StoreFs.mkdirs(nested)
    assert(StoreFs.exists(nested))
    StoreFs.writeAtomic(s"$nested/x.bin", Array[Byte](1, 2, 3))
    StoreFs.deleteRecursive(s"$dir/a")
    assert(!StoreFs.exists(s"$dir/a"))
    assert(StoreFs.exists(dir))
    StoreFs.deleteRecursive(dir)
  }

  test("hasParquetFiles sees nested parquet and ignores markers") {
    val dir = tmpDir()
    StoreFs.mkdirs(s"$dir/seg=1/postings/tb=0")
    StoreFs.writeAtomic(s"$dir/seg=1/postings/_SUCCESS", Array.empty[Byte])
    assert(!StoreFs.hasParquetFiles(s"$dir/seg=1/postings"))
    StoreFs.writeAtomic(s"$dir/seg=1/postings/tb=0/part-0.parquet", Array[Byte](0))
    assert(StoreFs.hasParquetFiles(s"$dir/seg=1/postings"))
    assert(!StoreFs.hasParquetFiles(s"$dir/seg=2"))
    StoreFs.deleteRecursive(dir)
  }

  test("modificationTime is 0 for missing paths and sane for present ones") {
    val dir = tmpDir()
    assert(StoreFs.modificationTime(s"$dir/nope") == 0L)
    StoreFs.mkdirs(s"$dir/seg=1")
    val t = StoreFs.modificationTime(s"$dir/seg=1")
    assert(t > 0L && t <= System.currentTimeMillis() + 60000L)
    StoreFs.deleteRecursive(dir)
  }

  test("BatchState on StoreFs: commit/read/write/delete round-trip") {
    val dir = tmpDir()
    assert(BatchState.read(dir) == BatchState(Nil))
    BatchState.commit(dir, graft.time.BatchID(3))
    BatchState.commit(dir, graft.time.BatchID(1))
    assert(BatchState.read(dir).committed == List(1L, 3L))
    BatchState.write(dir, BatchState(List(7L)))
    assert(BatchState.read(dir).committed == List(7L))
    BatchState.deleteDir(dir)
    assert(!StoreFs.exists(dir))
  }
}
