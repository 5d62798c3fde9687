package graft.engine

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the local-FS behavior the commit protocol rests on: the
  * Hadoop FileContext rename seam must refuse to replace (the lost-
  * update / adopt-theirs signal) and must replace atomically when
  * asked (idempotent re-commits). No SparkSession needed. */
class FsSpec extends AnyFunSuite {

  private def scratch() = Files.createTempDirectory("graft-fs").toFile

  test("renameNoReplace moves a directory and throws on an existing " +
    "destination, leaving both sides intact") {
    val root = scratch()
    val src = new java.io.File(root, "src")
    src.mkdirs()
    Files.writeString(new java.io.File(src, "a.txt").toPath, "A")
    val dst = new java.io.File(root, "dst")
    Fs.renameNoReplace(src, dst)
    assert(!src.exists() && dst.isDirectory)
    assert(Files.readString(new java.io.File(dst, "a.txt").toPath) == "A")
    // a second committer loses LOUDLY — and nothing is clobbered
    val src2 = new java.io.File(root, "src2")
    src2.mkdirs()
    Files.writeString(new java.io.File(src2, "a.txt").toPath, "B")
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      Fs.renameNoReplace(src2, dst)
    }
    assert(src2.isDirectory, "loser's staging must survive the refusal")
    assert(Files.readString(new java.io.File(dst, "a.txt").toPath) == "A",
      "winner's commit must be untouched")
  }

  test("renameNoReplace throws for an existing destination FILE too " +
    "(manifest generation collisions)") {
    val root = scratch()
    val f1 = new java.io.File(root, "g1")
    Files.writeString(f1.toPath, "gen1")
    val f2 = new java.io.File(root, "g1.tmp")
    Files.writeString(f2.toPath, "gen1-loser")
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      Fs.renameNoReplace(f2, f1)
    }
    assert(Files.readString(f1.toPath) == "gen1")
  }

  test("renameReplace overwrites an existing file in one step — the " +
    "idempotent re-commit path") {
    val root = scratch()
    val dst = new java.io.File(root, "v=3")
    Files.writeString(dst.toPath, "old")
    val tmp = new java.io.File(root, ".tmp-3")
    Files.writeString(tmp.toPath, "new")
    Fs.renameReplace(tmp, dst)
    assert(!tmp.exists())
    assert(Files.readString(dst.toPath) == "new")
  }
}
