package graft.ids

import java.util.regex.Pattern

/** Sci-hub style download-link rewriting.
  *
  * Reference: LINK_CLEANING_PATTERN + format_download_link
  * (/root/reference/src/downloaders.py:27-29, :232-280); goldens
  * /root/reference/tests/test_downloaders.py:90-110.
  */
object LinkCleaner {

  private val LinkCleaning = Pattern.compile("(location\\.href=')(/+)?")

  /** Rewrite `location.href='...` onclick payloads into absolute URLs:
    * a `//host/...` payload gets `https://`, a `/path` payload gets the
    * scraper's base url. Non-matching input -> None (reference returns
    * None when the anchored match fails).
    */
  def formatDownloadLink(downloadLink: String, baseUrl: String): Option[String] = {
    if (downloadLink == null) return None
    val m = LinkCleaning.matcher(downloadLink)
    if (!m.lookingAt()) return None // Python .match = anchored at start
    val locationHref = m.group(1)
    val sep = m.group(2)
    if (sep == null) return None // reference would throw on None sep; treat as no-op miss
    var link = downloadLink.replace(locationHref, "")
    link =
      if (sep == "//") link.replaceFirst(Pattern.quote(sep), "https://")
      else link.replaceFirst(Pattern.quote(sep), java.util.regex.Matcher.quoteReplacement(baseUrl))
    Some(link)
  }
}
