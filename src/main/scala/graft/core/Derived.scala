package graft.core

/** Naming for the on-disk derive-once caches under `target/graft_derived`.
  *
  * The cache key must change when the SOURCE data changes: a sanitized
  * dir-name alone collides for distinct dirs that sanitize identically,
  * and silently serves stale parquet when testdata is regenerated in
  * place. The tag therefore combines the readable sanitized name with a
  * fingerprint of the full path plus every source file's (relative name,
  * size, mtime) — regenerating any input invalidates every derived
  * artifact keyed on it. */
object Derived {

  /** Stable cache tag for a source data directory. */
  def tag(d: String): String = {
    val name = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    s"$name-${fingerprint(d)}"
  }

  private def fingerprint(d: String): String = {
    val sb = new StringBuilder(d)
    def walk(f: java.io.File, rel: String): Unit = {
      sb.append('|').append(rel).append(':')
        .append(f.length()).append(':').append(f.lastModified())
      val children = f.listFiles()
      if (children != null)
        children.sortBy(_.getName).foreach(c => walk(c, s"$rel/${c.getName}"))
    }
    walk(new java.io.File(d), "")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.take(6).map(b => f"$b%02x").mkString
  }
}
