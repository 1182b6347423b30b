package graft.notify

import scala.collection.mutable.ListBuffer

/** Notification edge (SURVEY O21–O24). The engine renders the same HTML
  * bodies as the reference and hands them to a transport; transport
  * failures are swallowed (data-query.py:131-134 prints and returns —
  * a notification failure must never fail the pipeline).
  */
final case class Notification(
    recipient: String, subject: String, bodyHtml: String)

trait Notifier {
  /** Deliver; implementations must not throw (O24 swallow semantics). */
  def send(n: Notification): Unit

  /** O21 — approval-request email (data-query.py:158-193). */
  def requestApproval(recipient: String, operation: String, tableName: String,
      fileName: String, eventId: String, bucket: String, fileVersion: Long,
      timestamp: String, approveUrl: String, rejectUrl: String): Unit = {
    val subject = s"Approval Required: ${operation.toUpperCase} operation on $tableName"
    val body =
      s"""<html><body>
         |<h2>Data Operation Approval Required</h2>
         |<p><b>Operation:</b> ${operation.toUpperCase}</p>
         |<p><b>Table:</b> $tableName</p>
         |<p><b>File:</b> $fileName (version $fileVersion)</p>
         |<p><b>Event ID:</b> $eventId</p>
         |<p><b>Bucket:</b> $bucket</p>
         |<p><b>Timestamp:</b> $timestamp</p>
         |<p><a href="$approveUrl">APPROVE</a> | <a href="$rejectUrl">REJECT</a></p>
         |</body></html>""".stripMargin
    send(Notification(recipient, subject, body))
  }

  /** O22 — operation-result email (process-pipeline.py:366-387). */
  def reportResult(recipient: String, operation: String, tableName: String,
      fileName: String, eventId: String, bucket: String, success: Boolean,
      details: String, timestamp: String): Unit = {
    val outcome = if (success) "SUCCESS" else "FAILURE"
    val subject = s"Operation $outcome: ${operation.toUpperCase} on $tableName"
    val body =
      s"""<html><body>
         |<h2>Data Operation Result: $outcome</h2>
         |<p><b>Operation:</b> ${operation.toUpperCase}</p>
         |<p><b>Table:</b> $tableName</p>
         |<p><b>File:</b> $fileName</p>
         |<p><b>Event ID:</b> $eventId</p>
         |<p><b>Details:</b> $details</p>
         |<p><b>Bucket:</b> $bucket</p>
         |<p><b>Timestamp:</b> $timestamp</p>
         |</body></html>""".stripMargin
    send(Notification(recipient, subject, body))
  }
}

/** Test/local transport: records everything, never fails. */
final class InMemoryNotifier extends Notifier {
  val sent: ListBuffer[Notification] = ListBuffer.empty
  override def send(n: Notification): Unit = synchronized { sent += n }
}

/** Production transport would POST to a mail API with a bounded timeout
  * (the reference uses 30 s, data-query.py:130); any error is printed
  * and swallowed.
  */
final class LoggingNotifier extends Notifier {
  override def send(n: Notification): Unit =
    try println(s"[notify] to=${n.recipient} subject=${n.subject}")
    catch { case _: Throwable => () }
}
