package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the IVF store-maintenance pair: compaction rewrites each list as
  * ONE file with byte-identical search results, and refit re-assigns the
  * grown corpus under fresh centers with stored-search == in-memory-
  * search identity. Both swaps leave no temp residue. */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 120).map { i =>
    (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d * 1.3).toFloat))
  }.toDF("vec_id", "embedding")

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  private def listDirs(root: String): Seq[java.io.File] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("list="))

  test("compactStore: one file per list, search identity, no temp residue") {
    val path = java.nio.file.Files.createTempDirectory("ivf_compact_spec")
      .toString + "/store"
    val emb = corpus
    val hist = emb.filter($"vec_id" < 60)
    val centers = Ivf.fitCentroids(hist, 4)
    Ivf.writeListPartitioned(hist, centers, path)
    // three appends -> several small files inside the hit lists
    Ivf.appendToStore(emb.filter($"vec_id" >= 60 && $"vec_id" < 80), centers, path)
    Ivf.appendToStore(emb.filter($"vec_id" >= 80 && $"vec_id" < 100), centers, path)
    Ivf.appendToStore(emb.filter($"vec_id" >= 100), centers, path)
    assert(listDirs(path).exists(parquetFiles(_).size > 1),
      "fixture must reproduce the small-files state compaction exists for")
    val probes = emb.filter($"vec_id" % 10 === 0)
    val before = Ivf.knnIvfStored(spark, path, centers, probes, 5).collect().toSeq
    Ivf.compactStore(spark, path)
    listDirs(path).foreach { d =>
      assert(parquetFiles(d).size == 1, s"${d.getName} not compacted to one file")
    }
    val after = Ivf.knnIvfStored(spark, path, centers, probes, 5).collect().toSeq
    assert(after == before, "compaction changed search results")
    assert(!new java.io.File(path + "__compacting").exists(), "temp residue")
    assert(!new java.io.File(path + "__old").exists(), "backup residue")
    // r12 swap discipline: a stale __old backup from an interrupted
    // earlier swap must not block the next maintenance run
    new java.io.File(path + "__old/stale").mkdirs()
    Ivf.compactStore(spark, path)
    assert(!new java.io.File(path + "__old").exists(), "stale backup cleared")
    val again = Ivf.knnIvfStored(spark, path, centers, probes, 5).collect().toSeq
    assert(again == before, "re-compaction changed search results")
  }

  test("refit: store search under new centers equals in-memory search") {
    val path = java.nio.file.Files.createTempDirectory("ivf_refit_spec")
      .toString + "/store"
    val emb = corpus
    val hist = emb.filter($"vec_id" < 60)
    val histCenters = Ivf.fitCentroids(hist, 4)
    Ivf.writeListPartitioned(hist, histCenters, path)
    Ivf.appendToStore(emb.filter($"vec_id" >= 60), histCenters, path)
    val centers = Ivf.refit(spark, path, 4)
    assert(centers.length == 4)
    // refit is also a compaction: one file per list
    listDirs(path).foreach { d =>
      assert(parquetFiles(d).size == 1, s"${d.getName} not single-file after refit")
    }
    val probes = emb.filter($"vec_id" % 10 === 0)
    val stored = Ivf.knnIvfStored(spark, path, centers, probes, 5).collect().toSeq
    val memory = Ivf.knnIvfWith(centers, emb, probes, 5).collect().toSeq
    assert(stored == memory, "refit store diverged from the in-memory search")
    assert(!new java.io.File(path + "__refitting").exists(), "temp residue")
  }

  test("refit centers actually move when the corpus grows elsewhere") {
    val path = java.nio.file.Files.createTempDirectory("ivf_drift_spec")
      .toString + "/store"
    val hist = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(8)(d => (i % 3 + d * 0.01).toFloat)))
      .toDF("vec_id", "embedding")
    // the appended mass lives far from every history point
    val drift = (40 until 120)
      .map(i => (i.toLong, Array.tabulate(8)(d => (50.0 + i % 5 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val histCenters = Ivf.fitCentroids(hist, 3)
    Ivf.writeListPartitioned(hist, histCenters, path)
    Ivf.appendToStore(drift, histCenters, path)
    val refitted = Ivf.refit(spark, path, 3)
    assert(refitted != histCenters,
      "a 2/3-drifted corpus must move at least one centroid")
  }
}
