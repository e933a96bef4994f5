package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** THE engine-agnostic hash kernel, defined once: the 60-bit integer form
  * of an md5 prefix — `int(md5(x)[0:15], 16)` — reproducible bit-for-bit in
  * DuckDB as `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`, so every
  * oracle can replay every hash-derived decision (shingle minhashes, LSH
  * permutation seeds, deterministic samplers, split/mixture draws, graph
  * sparsifiers). 60 bits keeps the value positive in a signed BIGINT on
  * both engines.
  *
  * One definition matters: the recipe (digit count, radix, prefix length)
  * is mirrored by hand inside oracle SQL strings across modules — a tweak
  * applied to one inline copy would silently diverge the others.
  */
private[operators] object Hashing {
  /** 60-bit hash of an arbitrary string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
