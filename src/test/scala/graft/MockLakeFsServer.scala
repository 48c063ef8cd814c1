package graft

import java.net.InetSocketAddress

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * In-process lakeFS API mock for [[graft.kernel.LakeFsClient]] conformance:
 * branches are copy-on-write snapshots of their source; merge is a real
 * three-way against the branch-point snapshot, answering 409 when the
 * target changed a path the transaction also changed (the exact conflict
 * the commit protocol rides); commits require staged changes unless
 * `allow_empty`; object listing paginates with `has_more`/`next_offset`.
 * Every request must carry the expected HTTP basic credentials.
 */
class MockLakeFsServer(user: String, pass: String, pageSize: Int = 1000) {

  private case class Blob(bytes: Array[Byte], mtimeMs: Long)
  private class Branch(var data: mutable.LinkedHashMap[String, Blob],
                       var base: Map[String, Blob],
                       var committed: Map[String, Blob])
  // repo -> branch -> state; a default repo/main pair exists up front
  private val repos = mutable.Map[String, mutable.Map[String, Branch]]()
  private val lock = new Object

  def addRepo(repo: String, defaultBranch: String = "main"): Unit = lock.synchronized {
    repos.getOrElseUpdate(repo, mutable.Map(defaultBranch ->
      new Branch(mutable.LinkedHashMap.empty, Map.empty, Map.empty)))
    ()
  }

  /** Fault injection on the `objects/ls` endpoint: the next N list
    * requests answer 429 with `Retry-After: throttleRetryAfterSecs`
    * (None = no header) — the read-side pacing path for the lakeFS
    * dialect; a mid-pagination 429 must restart the listing cleanly. */
  val throttleLists = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Let this many list requests pass BEFORE throttling — positions the
    * 429 on a later pagination page (mid-listing restart coverage). */
  val throttleSkip = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var throttleRetryAfterSecs: Option[Int] = Some(1)
  private val throttled429 = new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many LISTs were actually answered 429 since construction. */
  def throttledCount: Int = throttled429.get()

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "mock-lakefs"); t.setDaemon(true); t })
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def jsonResp(ex: HttpExchange, code: Int, json: String): Unit =
    respond(ex, code, json.getBytes("UTF-8"))

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap

  private def same(a: Option[Blob], b: Option[Blob]): Boolean = (a, b) match {
    case (None, None) => true
    case (Some(x), Some(y)) => java.util.Arrays.equals(x.bytes, y.bytes)
    case _ => false
  }

  private def jstr(s: String) = JsonMethods.compact(JsonMethods.render(JString(s)))

  private def handle(ex: HttpExchange): Unit = try {
    val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes("UTF-8"))
    if (!Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expected)) {
      respond(ex, 401, "bad credentials".getBytes("UTF-8"))
      return
    }
    val path = ex.getRequestURI.getRawPath
    val segs = path.stripPrefix("/").split("/", -1).toSeq
      .map(java.net.URLDecoder.decode(_, "UTF-8"))
    val method = ex.getRequestMethod
    val body = if (method == "POST" || method == "PUT")
      ex.getRequestBody.readAllBytes() else Array.empty[Byte]
    // /api/v1/repositories/{repo}/...
    if (segs.take(3) != Seq("api", "v1", "repositories") || segs.length < 4) {
      respond(ex, 404); return
    }
    val repo = segs(3)
    lock.synchronized {
      val branches = repos.getOrElse(repo, { respond(ex, 404); return })
      (method, segs.drop(4)) match {
        case ("POST", Seq("branches")) =>
          val j = JsonMethods.parse(new String(body, "UTF-8"))
          val JString(name) = (j \ "name"): @unchecked
          val JString(source) = (j \ "source"): @unchecked
          branches.get(source) match {
            case None => respond(ex, 404)
            case Some(src) =>
              if (branches.contains(name)) respond(ex, 409)
              else {
                val snap = src.data.toMap
                branches(name) = new Branch(
                  mutable.LinkedHashMap.from(src.data), snap, snap)
                respond(ex, 201)
              }
          }
        case ("DELETE", Seq("branches", b)) =>
          respond(ex, if (branches.remove(b).isDefined) 204 else 404)
        case ("POST", Seq("branches", b, "commits")) =>
          branches.get(b) match {
            case None => respond(ex, 404)
            case Some(br) =>
              val j = JsonMethods.parse(new String(body, "UTF-8"))
              val allowEmpty = (j \ "allow_empty") match {
                case JBool(v) => v; case _ => false
              }
              val changed = br.data.keySet != br.committed.keySet ||
                br.data.exists { case (k, v) => !same(Some(v), br.committed.get(k)) }
              if (!changed && !allowEmpty)
                jsonResp(ex, 400, s"""{"message":"commit: no changes"}""")
              else { br.committed = br.data.toMap; respond(ex, 201) }
          }
        case ("POST", Seq("refs", src, "merge", dst)) =>
          (branches.get(src), branches.get(dst)) match {
            case (Some(s), Some(d)) =>
              val allKeys = s.data.keySet ++ s.base.keySet
              val changes = allKeys.toSeq.filter(k =>
                !same(s.data.get(k), s.base.get(k)))
              val conflict = changes.exists(k => !same(d.data.get(k), s.base.get(k)))
              if (conflict)
                jsonResp(ex, 409, s"""{"message":"merge conflict"}""")
              else {
                changes.foreach { k =>
                  s.data.get(k) match {
                    case Some(v) => d.data(k) = v
                    case None => d.data.remove(k)
                  }
                }
                d.committed = d.data.toMap
                jsonResp(ex, 200, s"""{"reference":${jstr("c-" + System.nanoTime())}}""")
              }
            case _ => respond(ex, 404)
          }
        case (m, Seq("branches", b, "objects")) if m == "PUT" || m == "DELETE" =>
          branches.get(b) match {
            case None => respond(ex, 404)
            case Some(br) =>
              val p = params(ex).getOrElse("path", "")
              if (m == "PUT") {
                br.data(p) = Blob(body, System.currentTimeMillis())
                respond(ex, 201)
              } else respond(ex, if (br.data.remove(p).isDefined) 204 else 404)
          }
        case ("GET", Seq("refs", ref, "objects")) =>
          branches.get(ref) match {
            case None => respond(ex, 404)
            case Some(br) => br.data.get(params(ex).getOrElse("path", "")) match {
              case Some(bl) => respond(ex, 200, bl.bytes)
              case None => respond(ex, 404)
            }
          }
        case ("GET", Seq("refs", ref, "objects", "stat")) =>
          branches.get(ref) match {
            case None => respond(ex, 404)
            case Some(br) =>
              val p = params(ex).getOrElse("path", "")
              br.data.get(p) match {
                case Some(bl) => jsonResp(ex, 200,
                  s"""{"path":${jstr(p)},"size_bytes":${bl.bytes.length},"mtime":${bl.mtimeMs / 1000}}""")
                case None => respond(ex, 404)
              }
          }
        case ("GET", Seq("refs", ref, "objects", "ls")) =>
          if (throttleSkip.get() > 0 && throttleSkip.decrementAndGet() >= 0) {
            // pass through: this request is before the injected fault window
          } else if (throttleLists.get() > 0 && throttleLists.decrementAndGet() >= 0) {
            throttled429.incrementAndGet()
            throttleRetryAfterSecs.foreach(s =>
              ex.getResponseHeaders.set("Retry-After", s.toString))
            respond(ex, 429,
              """{"message":"too many requests"}""".getBytes("UTF-8"))
            return
          }
          branches.get(ref) match {
            case None => respond(ex, 404)
            case Some(br) =>
              val q = params(ex)
              val prefix = q.getOrElse("prefix", "")
              val after = q.getOrElse("after", "")
              val all = br.data.toSeq.filter(_._1.startsWith(prefix))
                .sortBy(_._1).dropWhile(_._1 <= after && after.nonEmpty)
              val (page, rest) = all.splitAt(pageSize)
              val items = page.map { case (k, bl) =>
                s"""{"path":${jstr(k)},"size_bytes":${bl.bytes.length},"mtime":${bl.mtimeMs / 1000}}"""
              }.mkString(",")
              val pag =
                if (rest.nonEmpty)
                  s""""pagination":{"has_more":true,"next_offset":${jstr(page.last._1)}}"""
                else """"pagination":{"has_more":false,"next_offset":""}"""
              jsonResp(ex, 200, s"""{"results":[$items],$pag}""")
          }
        case _ => respond(ex, 404)
      }
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[mock-lakefs] handler error: $e")
      respond(ex, 500)
  }
}
