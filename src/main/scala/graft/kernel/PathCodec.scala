package graft.kernel

/**
 * Delta `add`/`remove`/`cdc` `path` fields are RELATIVE URLS — percent-
 * encoded (PROTOCOL.md "Add File and Remove File"). A partition dir whose
 * ON-DISK name is `x=A%2FA` (hive-escaped "A/A") is recorded in the log as
 * `x=A%252FA`; readers must URI-decode before touching the filesystem and
 * writers must URI-encode what they record (reference: delta-rs joins add
 * paths onto the table URL, `crates/core/src/logstore/mod.rs` `to_uri`).
 * Getting this wrong silently breaks cross-implementation reads of any
 * table with special characters in partition values or file names.
 */
object PathCodec {

  /** Log-recorded relative URL → literal filesystem path fragment. */
  def decode(rel: String): String =
    try {
      val u = new java.net.URI(rel)
      // scheme'd/absolute URIs are handled by the caller via Path(URI)
      if (u.isAbsolute) rel
      // a parsed query/fragment means a literal legacy path containing
      // '?'/'#' (a compliant writer would have percent-encoded them) —
      // u.getPath would silently TRUNCATE at the separator
      else if (u.getRawQuery != null || u.getRawFragment != null) rel
      else Option(u.getPath).getOrElse(rel)
    } catch { case _: Exception => rel } // tolerate non-URI legacy paths

  /** Literal filesystem path fragment → log-recordable relative URL. */
  def encode(relFsPath: String): String =
    try new java.net.URI(null, null, relFsPath, null).getRawPath
    catch { case _: Exception => relFsPath }
}
