package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class FsSpec extends AnyFunSuite {

  test("deleteRecursively removes a tree") {
    val root = Files.createTempDirectory("fs_del")
    Files.createDirectories(root.resolve("a/b"))
    Files.writeString(root.resolve("a/b/f.txt"), "x")
    graft.util.Fs.deleteRecursively(root.toFile)
    assert(!Files.exists(root))
  }

  test("deleteRecursively does NOT follow directory symlinks (deletes the link only)") {
    // File.listFiles RESOLVES a symlink child and lists the TARGET's
    // contents — unguarded recursion deletes files OUTSIDE the tree
    // through the link (empirically confirmed before the isSymbolicLink
    // guard; callers pass user-supplied paths like Verify's outDir)
    val outside = Files.createTempDirectory("fs_outside")
    val precious = outside.resolve("precious.txt")
    Files.writeString(precious, "do not delete")
    val tree = Files.createTempDirectory("fs_tree")
    try {
      Files.createSymbolicLink(tree.resolve("link"), outside)
      graft.util.Fs.deleteRecursively(tree.toFile)
      assert(!Files.exists(tree), "the tree itself must be gone")
      assert(Files.exists(precious),
        "recursion followed the symlink and destroyed data outside the tree")
    } finally {
      graft.util.Fs.deleteRecursively(outside.toFile)
    }
  }
}
