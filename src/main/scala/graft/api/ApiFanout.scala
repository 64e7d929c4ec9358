package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Executor-side HTTP fan-out (SURVEY.md §2.1 API clients + §2.11
  * thread-pool map).
  *
  * The reference fans out one HTTP GET per parameter set from a
  * driver-side thread pool (`multithreading_list`
  * `/root/reference/src/pyveb/common.py:137-168`), with exponential
  * backoff + jitter (`api_client.py:50-51`), Retry-After on 429
  * (`custom_decorators.py:80-147`), request params copied into the
  * response for later joins (`api_client.py:74-83`), and errors
  * collected instead of raised (`common.py:160-168`).
  *
  * Engine mapping: params live in a DataFrame; the fan-out is
  * `mapPartitions` so the IO concurrency is the number of executor
  * tasks (repartition the params to set it — at 1000 executors that is
  * 1000-way fan-out with zero driver involvement). The error channel
  * is a column-level ADT (ok/status/body/error/attempts), so partial
  * failure is queryable downstream instead of failing the stage.
  *
  * The transport is pluggable (and serializable) — tests and offline
  * environments inject a deterministic fake; production injects a real
  * HTTP client with the same contract.
  */
object ApiFanout {

  /** One attempt's outcome. `retryAfterMs` honors 429 Retry-After. */
  final case class Response(status: Int, body: String, retryAfterMs: Option[Long] = None)

  /** Serializable transport: params-JSON → response. Throwing is
    * equivalent to a 599 network error (retried). */
  trait Transport extends Serializable {
    def fetch(paramsJson: String): Response
  }

  final case class FanoutResult(params: String, ok: Boolean, status: Int,
                                body: String, error: String, attempts: Int)

  final case class RetryPolicy(maxRetries: Int = 3, baseBackoffMs: Long = 200,
                               maxBackoffMs: Long = 10000, jitter: Boolean = true) {
    /** 5xx and network errors retry; 4xx (except 429) do not. */
    def retryable(status: Int): Boolean = status == 429 || status >= 500

    def backoffMs(attempt: Int, paramsHash: Int): Long = {
      val exp = math.min(maxBackoffMs, baseBackoffMs * (1L << math.min(attempt, 20)))
      if (!jitter) exp
      else {
        // deterministic jitter in [0.5, 1.0) of the exponential step
        val j = ((paramsHash * 2654435761L + attempt) >>> 33).toDouble / (1L << 31).toDouble
        (exp * (0.5 + 0.5 * j)).toLong
      }
    }
  }

  /** Fan out one call per row of `params` (each row serialized to a
    * JSON object — the reference's param-dict). Returns the full
    * result ADT; join it back on the `params` column or parse `body`.
    */
  def fanout(params: DataFrame, transport: Transport,
             policy: RetryPolicy = RetryPolicy(),
             sleeper: Long => Unit = ms => Thread.sleep(ms)): Dataset[FanoutResult] = {
    val jsonParams = params.select(
      to_json(struct(params.columns.map(col).toIndexedSeq: _*)).as("params"))
    implicit val enc = Encoders.product[FanoutResult]
    jsonParams.as(Encoders.STRING).mapPartitions { it =>
      it.map { p =>
        var attempt = 0
        var done: FanoutResult = null
        while (done == null) {
          attempt += 1
          val resp =
            try transport.fetch(p)
            catch {
              case e: InterruptedException => throw e // task cancellation
              case e if !scala.util.control.NonFatal(e) => throw e
              // network-ish failure → synthetic 599, message preserved
              // in the body so the error channel stays diagnosable
              case scala.util.control.NonFatal(e) =>
                Response(599, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}", None)
            }
          if (resp.status >= 200 && resp.status < 300)
            done = FanoutResult(p, ok = true, resp.status, resp.body, "", attempt)
          else if (!policy.retryable(resp.status) || attempt > policy.maxRetries)
            done = FanoutResult(p, ok = false, resp.status, resp.body,
              s"status ${resp.status} after $attempt attempts", attempt)
          else
            sleeper(resp.retryAfterMs.getOrElse(policy.backoffMs(attempt, p.hashCode)))
        }
        done
      }
    }
  }

  /** Re-attach the original param columns to fan-out results (the
    * reference's api_param_ / fk_ passthrough): parse the params JSON
    * back with the original schema. */
  def withParams(results: Dataset[FanoutResult], paramsSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val r = results.toDF()
    r.select(from_json(col("params"), paramsSchema).as("p"),
        col("ok"), col("status"), col("body"), col("error"), col("attempts"))
      .select((paramsSchema.fieldNames.map(f => col(s"p.$f")) ++
        Seq(col("ok"), col("status"), col("body"), col("error"), col("attempts"))).toIndexedSeq: _*)
  }
}
