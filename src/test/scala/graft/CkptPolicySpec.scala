package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.storage.StorageLevel
import graft.util.Ckpt.CkptOps

/** Standing regression protection for the r14 checkpoint-OOM fix
  * (r14 verdict #3, pinned r15). The sf3 scale rehearsal killed the
  * JVM inside `MemoryStore.putIteratorAsValues` — the DESERIALIZED
  * unroll path of default `localCheckpoint` overshoots its sampling-
  * based accounting under concurrent dense unrolls and dies before it
  * can spill. The fix routes every data-sized checkpoint through
  * `Ckpt.ckptSer` (eager + MEMORY_AND_DISK_SER: incremental byte
  * accounting, graceful disk fallback). Reproducing the actual OOM
  * in-suite would require killing this JVM, so the spec pins the fix
  * the way it can be pinned mechanically:
  *
  *  1. a SOURCE GATE — no raw `.localCheckpoint(` call may exist in
  *     src/main outside the helper itself, so a contributor reverting
  *     a site to the default (deserialized) path fails the suite, not
  *     an sf3 rehearsal someone must remember to run;
  *  2. a BEHAVIORAL pin — ckptSer really persists at
  *     MEMORY_AND_DISK_SER and is eager (materialized at call time:
  *     the lazy form can ABBA-deadlock under concurrent consumers,
  *     the r13 Dedup posture note). */
class CkptPolicySpec extends SparkSpec {

  test("no raw localCheckpoint outside util/Ckpt.scala (source gate)") {
    val root = Paths.get("src/main/scala")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => p.toString.replace('\\', '/').endsWith("graft/util/Ckpt.scala"))
      .flatMap { p =>
        new String(Files.readAllBytes(p), "UTF-8").linesIterator.zipWithIndex
          .filter { case (line, _) =>
            line.contains(".localCheckpoint(") && !line.trim.startsWith("//") &&
              !line.trim.startsWith("*")
          }
          .map { case (_, i) => s"$p:${i + 1}" }
      }
      .toList
    assert(offenders.isEmpty,
      s"raw .localCheckpoint( outside Ckpt.ckptSer — the deserialized " +
        s"unroll path OOMs at scale (r14 sf3 rehearsal): $offenders")
  }

  test("ckptSer persists at MEMORY_AND_DISK_SER, eagerly") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ck = (1 to 1000).toDF("v").ckptSer()
    // eager: the checkpoint RDD exists (and is this level) WITHOUT any
    // action on `ck` having run yet
    val added = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(added.nonEmpty, "ckptSer must materialize at call time (eager)")
    assert(added.values.exists(_.getStorageLevel == StorageLevel.MEMORY_AND_DISK_SER),
      s"expected MEMORY_AND_DISK_SER, got ${added.values.map(_.getStorageLevel)}")
    assert(ck.count() == 1000)
    ck.unpersist()
  }
}
