package graft

import graft.sources.TarShards
import org.apache.spark.sql.functions._

/** ustar shard container: byte-level round trips at the block-size
  * edges, a committed GNU-tar cross-witness archive, corrupt-input
  * safety, and the pack/read Dataset operators. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("writeTar/listEntries/extract round-trip at block-size edges") {
    val files = Seq(
      ("sample_000.txt", "hello tar world".getBytes("UTF-8")),
      ("sample_001.bin", Array.tabulate[Byte](513)(i => (i % 251).toByte)),
      ("empty.txt", Array.empty[Byte]),
      ("block.bin", Array.fill[Byte](512)(7)))
    val tar = TarShards.writeTar(files)
    // sizes 0 / 512 / 513 exercise padding: 4 headers + 0+2+0+1 data
    // blocks + 2 terminator blocks = 10 blocks
    assert(tar.length == 10 * 512, tar.length)
    val es = TarShards.listEntries(tar)
    assert(es.map(e => (e.name, e.size)) ==
      files.map(f => (f._1, f._2.length.toLong)))
    es.zip(files).foreach { case (e, (_, p)) =>
      assert(java.util.Arrays.equals(TarShards.extract(tar, e), p), e.name)
    }
    // archive bytes are deterministic (mtime 0, fixed owner/mode)
    assert(java.util.Arrays.equals(tar, TarShards.writeTar(files)))
  }

  test("GNU-tar cross-witness: a committed ustar archive reads exactly") {
    // produced once by `tar --format=ustar --mtime=@0 --owner=0
    // --group=0`; GNU tar also reads OUR archives (verified at build
    // time) — this pins the read direction against the foreign writer
    val url = getClass.getClassLoader.getResource("golden/gnu_ustar.tar")
    val tar = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url.toURI))
    val es = TarShards.listEntries(tar)
    assert(es.map(e => (e.name, e.size)) == Seq(
      ("doc_a.txt", 19L), ("img_b.bin", 777L), ("zero.txt", 0L)))
    val byName = es.map(e => e.name -> TarShards.extract(tar, e)).toMap
    assert(new String(byName("doc_a.txt"), "UTF-8") == "the quick brown fox")
    assert(md5hex(byName("img_b.bin")) == "50e1fa051518a9da954558870e99aa41")
    assert(byName("zero.txt").isEmpty)
  }

  test("corrupt archives fail loudly at the kernel, drop softly in the reader") {
    val good = TarShards.writeTar(Seq(("a.txt", "abc".getBytes)))
    // flipped name byte -> stored checksum no longer matches the header
    val badCs = good.clone(); badCs(0) = 'z'.toByte
    val e1 = intercept[IllegalArgumentException](TarShards.listEntries(badCs))
    assert(e1.getMessage.contains("checksum"))
    // size field pointing past the buffer -> overrun guard
    val badSz = good.clone()
    // rewrite size to a huge octal AND fix the checksum so only the
    // overrun guard can catch it
    val huge = ("77777777777" + "\u0000").getBytes("US-ASCII")
    System.arraycopy(huge, 0, badSz, 124, 12)
    var sum = 0L
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toInt else badSz(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes("US-ASCII"),
      0, badSz, 148, 8)
    val e2 = intercept[IllegalArgumentException](TarShards.listEntries(badSz))
    assert(e2.getMessage.contains("overruns"))
    // negative octal size (crafted '-'): without the guard the walker
    // would step BACKWARD — an infinite loop on untrusted input
    val badNeg = good.clone()
    System.arraycopy(("-0000777777" + "\u0000").getBytes("US-ASCII"), 0, badNeg, 124, 12)
    var sum2 = 0L
    for (i <- 0 until 512)
      sum2 += (if (i >= 148 && i < 156) ' '.toInt else badNeg(i) & 0xff)
    val cs2 = java.lang.Long.toOctalString(sum2)
    System.arraycopy((("0" * (6 - cs2.length)) + cs2 + "\u0000 ").getBytes("US-ASCII"),
      0, badNeg, 148, 8)
    val e3 = intercept[IllegalArgumentException](TarShards.listEntries(badNeg))
    assert(e3.getMessage.contains("negative"))
    // the Dataset reader drops the corrupt shard, keeps the good one
    val rows = TarShards.readTarRows(
      Seq((1L, good), (2L, badCs)).toDF("id", "tar"), "id", "tar")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("packTarGroups is partitioning-invariant; readTarRows inverts it") {
    val docs = (0L until 24L).map(d =>
      (d % 3, f"doc_$d%03d.txt", s"payload $d".getBytes("UTF-8")))
    val a = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload").repartition(7), "grp", "name", "payload")
      .collect().map(r => r.getLong(0) -> md5hex(r.getAs[Array[Byte]]("tar"))).toMap
    val b = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload").repartition(2), "grp", "name", "payload")
      .collect().map(r => r.getLong(0) -> md5hex(r.getAs[Array[Byte]]("tar"))).toMap
    assert(a == b && a.size == 3, "shard bytes must not depend on partitioning")
    val shards = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload"), "grp", "name", "payload")
    val back = TarShards.readTarRows(shards, "grp", "tar")
      .select($"name", $"payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(back.size == 24)
    docs.foreach { case (_, n, p) =>
      assert(back(n) == new String(p, "UTF-8"), n)
    }
  }

  test("packTarGroups: a hot group SPLITS at the entry bound — no sample lost") {
    // one pathological group key (everything hashes to grp 0) with 100
    // entries; the unbounded r10 shape would materialize all of it in
    // one mapGroups buffer — the bound must cut deterministic parts
    val docs = (0L until 100L).map(d =>
      (0L, f"doc_$d%03d.txt", s"p$d".getBytes("UTF-8")))
    val shards = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload").repartition(5),
      "grp", "name", "payload", maxEntriesPerShard = 16)
      .orderBy($"part").collect()
    assert(shards.map(_.getInt(1)).toSeq == (0 until 7), "7 parts of <=16")
    assert(shards.map(_.getInt(3)).toSeq == Seq(16, 16, 16, 16, 16, 16, 4))
    // part boundaries land in NAME order: part 0 = doc_000..doc_015
    val part0 = TarShards.listEntries(shards(0).getAs[Array[Byte]]("tar"))
    assert(part0.map(_.name) == (0 until 16).map(d => f"doc_$d%03d.txt"))
    // nothing dropped, payloads intact
    val back = TarShards.readTarRows(
      TarShards.packTarGroups(docs.toDF("grp", "name", "payload"),
        "grp", "name", "payload", maxEntriesPerShard = 16)
        .select(($"grp" * 100 + $"part").as("sid"), $"tar"), "sid", "tar")
      .select($"name", $"payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(back.size == 100)
    docs.foreach { case (_, n, p) => assert(back(n) == new String(p, "UTF-8")) }
    // split is deterministic: same parts under different partitioning
    val again = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload").repartition(2),
      "grp", "name", "payload", maxEntriesPerShard = 16)
      .orderBy($"part").collect()
    assert(shards.map(r => md5hex(r.getAs[Array[Byte]]("tar"))).toSeq ==
      again.map(r => md5hex(r.getAs[Array[Byte]]("tar"))).toSeq)
  }

  test("packTarGroups: the BYTE bound cuts shards; an oversize entry ships alone") {
    val docs = Seq(
      (1L, "a.bin", new Array[Byte](600)),   // 512 hdr + 1024 data
      (1L, "b.bin", new Array[Byte](600)),
      (1L, "c.bin", new Array[Byte](5000)),  // alone: exceeds the bound by itself
      (1L, "d.bin", new Array[Byte](10)))
    // bound of 4096: a+b (2*1536 + 1024 term = 4096) fit; c spills to its
    // own part even though it overflows the bound alone; d follows
    val shards = TarShards.packTarGroups(
      docs.toDF("grp", "name", "payload"), "grp", "name", "payload",
      maxShardBytes = 4096L)
      .orderBy($"part")
      .select($"part", $"n_entries", $"tar_bytes", $"tar").collect()
    assert(shards.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 2), (1, 1), (2, 1)))
    assert(shards(0).getInt(2) <= 4096)
    val names = shards.map(r =>
      TarShards.listEntries(r.getAs[Array[Byte]]("tar")).map(_.name))
    assert(names.toSeq == Seq(Seq("a.bin", "b.bin"), Seq("c.bin"), Seq("d.bin")))
  }

  test("writeTar: long and non-ASCII names round-trip via pax 'x' headers") {
    // r11 made the READ side honor foreign long names; the write side
    // now emits the same pax form instead of rejecting. A 144-byte deep
    // path (the golden-fixture shape) and a UTF-8 key must both survive
    // writeTar ∥ listEntries byte-exactly — US-ASCII truncation or
    // '?'-substitution would silently collide distinct sample keys.
    val longName = (1 to 8).map(i => f"deep_dir_$i%03d").mkString("/") +
      "/sample_with_quite_a_long_key_name_00.txt"
    assert(longName.length == 144)
    val utf8Name = "samples/cliché_naïve_日本語_00.bin"
    val files = Seq(
      ("short.txt", "short sibling".getBytes("UTF-8")),
      (longName, "payload under a very long path".getBytes("UTF-8")),
      (utf8Name, Array.tabulate[Byte](700)(i => (i % 251).toByte)))
    val tar = TarShards.writeTar(files)
    // exact-size preallocation: archive bytes == the entryCost budget
    // packTarGroups uses (so predicted and written shard sizes agree)
    assert(tar.length.toLong ==
      files.map(f => TarShards.entryCost(f._1, f._2.length)).sum + 1024)
    val es = TarShards.listEntries(tar)
    assert(es.map(e => (e.name, e.size)) ==
      files.map(f => (f._1, f._2.length.toLong)))
    es.zip(files).foreach { case (e, (_, p)) =>
      assert(java.util.Arrays.equals(TarShards.extract(tar, e), p), e.name)
    }
    // empty names still reject loudly
    intercept[IllegalArgumentException](TarShards.writeTar(Seq(("", "x".getBytes))))
  }

  test("GNU tar cross-witnesses OUR pax archives (long + UTF-8 names)") {
    val tarBin = java.nio.file.Paths.get("/usr/bin/tar")
    assume(java.nio.file.Files.isExecutable(tarBin), "GNU tar not available")
    val longName = (1 to 8).map(i => f"deep_dir_$i%03d").mkString("/") +
      "/sample_with_quite_a_long_key_name_00.txt"
    val utf8Name = "samples/cliché_00.bin"
    val payloadL = "payload under a very long path".getBytes("UTF-8")
    val payloadU = Array.tabulate[Byte](513)(i => (i % 251).toByte)
    val tar = TarShards.writeTar(Seq((longName, payloadL), (utf8Name, payloadU)))
    val tmp = java.nio.file.Files.createTempFile("graft_pax_witness", ".tar")
    try {
      java.nio.file.Files.write(tmp, tar)
      def run(args: String*): Array[Byte] = {
        val pb = new ProcessBuilder((Seq("/usr/bin/tar") ++ args): _*)
        pb.redirectErrorStream(false)
        val p = pb.start()
        val out = p.getInputStream.readAllBytes()
        assert(p.waitFor() == 0, s"tar ${args.mkString(" ")} failed")
        out
      }
      // -tf escapes non-ASCII bytes in the C locale (clich\303\251…),
      // so pin the ASCII long name exactly and the count; the UTF-8
      // name is witnessed by exact-byte extraction below
      val listed = new String(run("-tf", tmp.toString), "UTF-8").split('\n').toSet
      assert(listed.contains(longName) && listed.size == 2, listed)
      assert(java.util.Arrays.equals(
        run("-xOf", tmp.toString, longName), payloadL))
      // the UTF-8 name can't ride an exec arg reliably (sun.jnu.encoding
      // may be ASCII in this container) — match it with an ASCII
      // wildcard; the member is unique so the payload pins it exactly
      assert(java.util.Arrays.equals(
        run("--wildcards", "-xOf", tmp.toString, "samples/*_00.bin"), payloadU))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("pax records parse by length prefix: newline-bearing paths survive") {
    // a path value legally containing '\n' breaks '\n'-split parsing;
    // the length-prefixed parser must reconstruct it exactly
    val weird = "dir/name_with_a\nnewline.txt"
    val tar = TarShards.writeTar(Seq((weird, "nl payload".getBytes("UTF-8"))))
    val es = TarShards.listEntries(tar)
    assert(es.map(_.name) == Seq(weird))
    assert(new String(TarShards.extract(tar, es.head), "UTF-8") == "nl payload")
    // a pax 'size' override (member > 8 GiB) rejects loudly instead of
    // misparsing every subsequent header at the stale octal size
    val rec = TarShards.paxRecord("size", "9999999999")
    val sizeOverride = TarShards.writeTar(Seq(("a.txt", "x".getBytes)))
    // graft a size-record pax header in front by building it manually:
    // reuse writeTar's own pax emission via a name that needs one, then
    // patch its record to 'size' — simpler: hand-build via paxRecord +
    // a long-named entry whose record we overwrite in place
    val paxTar = TarShards.writeTar(Seq(("n" * 120, "x".getBytes)))
    val pathRec = TarShards.paxRecord("path", "n" * 120)
    assert(rec.length <= pathRec.length) // fits in the same payload block
    val patched = paxTar.clone()
    java.util.Arrays.fill(patched, 512, 512 + pathRec.length, 0.toByte)
    System.arraycopy(rec, 0, patched, 512, rec.length)
    // fix the pax header's size field + checksum for the new record len
    val sizeOct = ("0" * (11 - java.lang.Long.toOctalString(rec.length.toLong).length)) +
      java.lang.Long.toOctalString(rec.length.toLong)
    System.arraycopy((sizeOct + " ").getBytes("US-ASCII"), 0, patched, 124, 12)
    var sum = 0L
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toInt else patched(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs + "  ").getBytes("US-ASCII"),
      0, patched, 148, 8)
    val e = intercept[IllegalArgumentException](TarShards.listEntries(patched))
    assert(e.getMessage.contains("size override"))
    assert(sizeOverride.nonEmpty) // (plain archive above still valid)
  }

  test("foreign long paths: ustar prefix, GNU 'L', and pax 'x' all stitch exactly") {
    // three archives of the SAME two members (short.txt + a 144-byte
    // path), written by GNU tar 1.34 in each of its three formats —
    // the 100-byte name field alone would silently truncate the key
    val longPath = "deep_dir_001/deep_dir_002/deep_dir_003/deep_dir_004/" +
      "deep_dir_005/deep_dir_006/deep_dir_007/deep_dir_008/" +
      "sample_with_quite_a_long_key_name_00.txt"
    assert(longPath.length == 144)
    for (fx <- Seq("posix_prefix.tar", "gnu_longname.tar", "pax_longname.tar")) {
      val url = getClass.getClassLoader.getResource(s"golden/$fx")
      val tar = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url.toURI))
      val es = TarShards.listEntries(tar)
      assert(es.map(_.name).toSet == Set("short.txt", longPath), fx)
      val byName = es.map(e => e.name -> TarShards.extract(tar, e)).toMap
      assert(new String(byName("short.txt"), "UTF-8") == "short sibling", fx)
      assert(new String(byName(longPath), "UTF-8") ==
        "payload under a very long path", fx)
    }
  }
}
