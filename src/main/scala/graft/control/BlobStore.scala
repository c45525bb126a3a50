package graft.control

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Blob storage seam (reference: pkg/storage/blobstore/blobstore.go —
  * Upload/Download/Delete over memory/S3/GCS). On a cluster, Spark's
  * Hadoop FS layer makes s3a:// and gs:// paths transparent, so the
  * local implementation is all the test deployment needs; the trait is
  * the boundary a cloud impl would plug into. */
trait BlobStore {
  def upload(key: String, localFile: Path): Unit
  def download(key: String, localFile: Path): Unit
  def delete(key: String): Unit
}

final class LocalBlobStore(root: String) extends BlobStore {
  Files.createDirectories(Paths.get(root))

  private def keyPath(key: String): Path = {
    val p = Paths.get(root, key).normalize()
    require(p.startsWith(Paths.get(root).normalize()), s"key escapes root: $key")
    p
  }

  override def upload(key: String, localFile: Path): Unit = {
    val dst = keyPath(key)
    Files.createDirectories(dst.getParent)
    Files.copy(localFile, dst, StandardCopyOption.REPLACE_EXISTING)
  }

  override def download(key: String, localFile: Path): Unit = {
    Files.createDirectories(localFile.getParent)
    Files.copy(keyPath(key), localFile, StandardCopyOption.REPLACE_EXISTING)
  }

  override def delete(key: String): Unit = Files.deleteIfExists(keyPath(key))
}
