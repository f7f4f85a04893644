package graft.core

/** Naming for the on-disk derive-once caches under `target/graft_derived`.
  *
  * The cache key must change when the SOURCE data changes: a sanitized
  * dir-name alone collides for distinct dirs that sanitize identically,
  * and silently serves stale parquet when testdata is regenerated in
  * place. The tag therefore combines the readable sanitized name with a
  * fingerprint of the full path plus every source file's (relative name,
  * size, mtime) — regenerating any input invalidates every derived
  * artifact keyed on it.
  *
  * The (name, size, mtime) triple misses one corner: a same-second,
  * same-size in-place rewrite (mtime granularity is 1 s on many
  * filesystems). For correctness-critical reruns set
  * `-Dgraft.derived.contentHash=true` (or env
  * `GRAFT_DERIVED_CONTENT_HASH=1`): the fingerprint then also samples
  * each file's first and last 4 KiB of CONTENT — enough to catch any
  * realistic rewrite (parquet footers carry per-file statistics and a
  * creation timestamp) without re-reading terabytes for a cache key. */
object Derived {

  /** Stable cache tag for a source data directory. */
  def tag(d: String): String = {
    val name = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    s"$name-${fingerprint(d)}"
  }

  private[core] def contentHashEnabled: Boolean =
    sys.props.get("graft.derived.contentHash").exists(_.equalsIgnoreCase("true")) ||
      sys.env.get("GRAFT_DERIVED_CONTENT_HASH").contains("1")

  private def fingerprint(d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sampleContent = contentHashEnabled
    md.update(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def walk(f: java.io.File, rel: String): Unit = {
      md.update(s"|$rel:${f.length()}:${f.lastModified()}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (sampleContent && f.isFile && f.length() > 0) {
        // readFully, not a single read(): read() may legally return
        // fewer bytes than requested even when more are available, and a
        // short read would change the fingerprint nondeterministically
        // across runs (spurious cache-key misses → rebuilds). Sample
        // sizes are clamped to the file length so EOF cannot hit —
        // UNLESS the file shrinks between the length() calls and the
        // read (data regenerated in place by a concurrent process). An
        // EOF there must perturb the fingerprint (→ cache-key miss and
        // rebuild), not abort the run (ADVICE r9).
        try {
          val raf = new java.io.RandomAccessFile(f, "r")
          try {
            val head = new Array[Byte](math.min(4096L, f.length()).toInt)
            raf.readFully(head)
            md.update(head)
            if (f.length() > 4096) {
              val tail = new Array[Byte](4096)
              raf.seek(f.length() - 4096)
              raf.readFully(tail)
              md.update(tail)
            }
          } finally raf.close()
        } catch {
          case _: java.io.IOException =>
            md.update("|concurrent-rewrite".getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      val children = f.listFiles()
      if (children != null)
        children.sortBy(_.getName).foreach(c => walk(c, s"$rel/${c.getName}"))
    }
    walk(new java.io.File(d), "")
    md.digest().take(6).map(b => f"$b%02x").mkString
  }
}
