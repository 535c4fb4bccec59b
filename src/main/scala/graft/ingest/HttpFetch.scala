package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** S1's live half — the reference fetches TLE text and NOAA JSON over
  * HTTP (`/root/reference/script.py:7,64,113-117`) and this library
  * otherwise starts at the landing zone. This utility closes the gap:
  * GET a URL, land the body ATOMICALLY in a landing directory (write
  * `._tmp-*`, then rename), so `TleText`, the `graft-tle` source, and
  * the NOAA decoder pick it up under their immutable-once-landed
  * contract.
  *
  * Deliberately driver-side and tiny: fetching is not a distributed
  * concern (one payload per poll — the reference's own shape), and the
  * sandbox this library is built in has zero egress, so the HTTP call
  * itself is UNTESTED against a live network; the landing write — the
  * part other components depend on — is spec-covered. Callers in a
  * fenced environment should fetch with their own tooling and land
  * files via [[land]] (or any write-then-rename).
  */
object HttpFetch {

  /** GET `url` (following redirects) and land the body in `landingDir`
    * as `fileName`. Non-2xx → IllegalStateException, nothing landed.
    */
  def fetchToLanding(url: String, landingDir: String, fileName: String,
      timeoutSeconds: Long = 30,
      conf: Configuration = new Configuration()): String = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      .build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"GET $url returned ${resp.statusCode()}")
    land(resp.body(), landingDir, fileName, conf)
  }

  /** Atomically land `payload` as `landingDir/fileName`: write to a
    * hidden `._tmp-*` (invisible to every data listing — FsListing's
    * rule), hsync, rename into place. The rename is the publish point;
    * a crash before it leaves only an ignorable temp file. Fails if the
    * destination already exists (landed files are immutable — the
    * streaming offset model depends on it).
    */
  def land(payload: String, landingDir: String, fileName: String,
      conf: Configuration = new Configuration()): String = {
    require(!fileName.startsWith("_") && !fileName.startsWith("."),
      s"landing name '$fileName' would be hidden from data listings")
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val dest = new Path(dir, fileName)
    if (fs.exists(dest))
      throw new IllegalStateException(
        s"landing file $dest already exists (landed files are immutable)")
    val tmp = new Path(dir, s"._tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try {
      out.write(payload.getBytes(StandardCharsets.UTF_8))
      out.hsync()
    } finally out.close()
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"landing publish failed for $dest")
    }
    dest.toString
  }
}
