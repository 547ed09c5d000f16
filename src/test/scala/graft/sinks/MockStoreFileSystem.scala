package graft.sinks

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** A non-`file` Hadoop FileSystem scheme (`mockstore://bucket/...`) backed
  * by local disk — the W10 remote-object-store stand-in the container
  * permits: it exercises the REAL production path (URI scheme dispatch
  * through `FileSystem.get`, authority handling, create/rename/list and
  * the output committer's `_temporary` protocol through the `FileSystem`
  * API — exactly what an s3a:// or swift:// deployment exercises) with
  * only the network transport swapped for local disk. The path component
  * maps to the local path identically (the bucket authority is carried in
  * the URI, not in the mapping), so every path the committer constructs
  * from a listing round-trips cleanly. Production code never references
  * this class; sinks take any Hadoop FS URI and the TEST registers the
  * scheme via `fs.mockstore.impl`.
  *
  * Reference behavior mirrored: osarchiver's swift destination uploads
  * finished archives to a remote container
  * (`osarchiver/destination/file/remote_store/swift.py:32-61`); here the
  * sink WRITES THROUGH the remote FS directly instead of a post-hoc
  * upload step — the Hadoop-native design.
  */
class MockStoreFileSystem extends RawLocalFileSystem {
  private var mockUri: URI = _

  override def getScheme: String = "mockstore"

  override def initialize(name: URI, conf: Configuration): Unit = {
    mockUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    super.initialize(name, conf)
  }

  // the RawLocalFileSystem CONSTRUCTOR already qualifies its working dir
  // against getUri(), before initialize() can run — fall back to the bare
  // scheme until the real authority arrives
  override def getUri: URI =
    if (mockUri != null) mockUri else URI.create("mockstore:///")
}
