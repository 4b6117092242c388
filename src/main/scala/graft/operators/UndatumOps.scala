package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's data-processing command surface (SURVEY.md §2),
  * re-expressed as declarative DataFrame transforms so Catalyst gets
  * full pushdown/pruning visibility. Each op cites the reference
  * implementation it re-targets.
  */
object UndatumOps {

  /** `undatum uniq`: distinct tuples of dot-path fields
    * (undatum/cmds/selector.py:32-54,88-109). Array-valued paths fan
    * out element-wise there; callers explode first when needed.
    */
  def uniq(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select(fields.map(col): _*).distinct()

  /** `undatum frequency`: group-by-count sorted by count ascending —
    * the reference sorts ascending (undatum/cmds/selector.py:161).
    * Tie-break on the fields for determinism.
    */
  def frequency(df: DataFrame, fields: Seq[String]): DataFrame =
    df.groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count") +: fields.map(col): _*)

  /** `undatum select`: keep/reorder columns by dot-path
    * (undatum/cmds/selector.py:176-223).
    */
  def select(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select(fields.map(col): _*)

  /** `undatum --filter` dictquery mini-DSL -> Spark SQL expression
    * text. The reference evaluates the dictquery DSL per record
    * (undatum/cmds/selector.py:204-207). Grammar subset:
    * backtick-quoted fields, ==/!=/>/>=/</<=, LIKE, IN (...),
    * AND/OR/NOT, string literals in single or double quotes.
    */
  def dictQueryToSql(q: String): String = {
    // rewrite == to = only OUTSIDE quoted string literals — a literal
    // like 'a == b' must survive verbatim
    val out = new StringBuilder(q.length)
    var i = 0
    var quote: Char = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (quote != 0) {
        out.append(c)
        // a backslash-escaped character inside the literal (\' or \\)
        // must not toggle the quote state — otherwise a literal like
        // 'O\'Brien == boss' closes early and the == inside it gets
        // rewritten, silently changing the compared value
        if (c == '\\' && i + 1 < q.length) {
          out.append(q.charAt(i + 1))
          i += 1
        } else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') {
        quote = c
        out.append(c)
      } else if (c == '=' && i + 1 < q.length && q.charAt(i + 1) == '=') {
        out.append('=')
        i += 1
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  def filterDsl(df: DataFrame, dictQuery: String): DataFrame =
    df.filter(expr(dictQueryToSql(dictQuery)))

  /** `undatum split` by field value: hive-style partitioned write
    * (undatum/cmds/selector.py:310-335 writes one file per distinct
    * value; partitionBy is the scale-out equivalent — naming delta
    * documented in SURVEY.md §2.7).
    */
  def splitByField(df: DataFrame, field: String, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(field).parquet(outDir)

  /** `undatum split` by chunk size (undatum/cmds/selector.py:264-309):
    * bounded records per output file.
    */
  def splitByChunk(df: DataFrame, chunkSize: Int, outDir: String): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", chunkSize.toLong).parquet(outDir)

  /** Partition counts — the verifiable core of split semantics. */
  def splitCounts(df: DataFrame, field: String): DataFrame =
    df.groupBy(field).agg(count(lit(1)).cast(LongType).as("n")).orderBy(field)

  /** `undatum headers`: leaf key-paths of the schema, dot-joined
    * (undatum/cmds/selector.py:112-138; kernel utils.py:166-178).
    * Spark's schema replaces the 10k-record sampling pass.
    */
  def headerPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => headerPaths(st, path)
        case _ => Seq(path)
      }
    }

  /** Leaf paths as SEGMENT lists — the resolvable form: a field whose
    * NAME contains a literal dot must be backtick-quoted per segment
    * or `col(path)` misreads it as nested access.
    */
  private def headerPathSegments(schema: StructType,
                                 prefix: Seq[String] = Nil): Seq[Seq[String]] =
    schema.fields.toSeq.flatMap { f =>
      val path = prefix :+ f.name
      f.dataType match {
        case st: StructType => headerPathSegments(st, path)
        case _ => Seq(path)
      }
    }

  private def colForSegments(segs: Seq[String]): Column =
    col(segs.map(s => "`" + s.replace("`", "``") + "`").mkString("."))

  def headers(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    headerPaths(df.schema).toDF("field")
  }

  /** `undatum stats` per-field profile
    * (undatum/cmds/statistics.py:30-148): total, n_uniq, share_uniq,
    * min/max/avg length of the string form, is_uniq, is_dictkey
    * (share_uniq < dictshare, default 70 — undatum/constants.py:5).
    * One row per field; single wide agg per field (Catalyst merges the
    * scans).
    */
  /** Resolve a field for profiling: a name that IS a top-level column
    * resolves verbatim (backticked — it may contain a literal dot);
    * anything else is treated as a dot-path into nested structs.
    */
  private def resolveField(df: DataFrame, f: String): Column =
    if (df.columns.contains(f)) col("`" + f.replace("`", "``") + "`")
    else col(f)

  def fieldStats(df: DataFrame, fields: Seq[String], dictShare: Double = 70.0): DataFrame = {
    // ONE wide aggregate over ONE scan (round 1 unioned an agg per
    // field — F full scans of the table; fatal at 100 TB), then an
    // explode-unpivot back to one row per field. Distinct counts hash
    // the value first: counting distinct 64-bit hashes equals counting
    // distinct strings modulo negligible collision, and the shuffle
    // carries 8 bytes instead of arbitrary-width strings.
    val aggCols = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = resolveField(df, f).cast(StringType)
      Seq(
        count(c).cast(LongType).as(s"__t_$i"),
        countDistinct(when(c.isNotNull, xxhash64(c))).cast(LongType).as(s"__u_$i"),
        min(length(c)).cast(LongType).as(s"__mn_$i"),
        max(length(c)).cast(LongType).as(s"__mx_$i"),
        avg(length(c)).as(s"__av_$i"))
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    val structs = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f).as("field"),
        col(s"__t_$i").as("total"),
        col(s"__u_$i").as("n_uniq"),
        col(s"__mn_$i").as("minlen"),
        col(s"__mx_$i").as("maxlen"),
        round(col(s"__av_$i"), 4).as("avglen"))
    }
    row.select(explode(array(structs: _*)).as("s")).select("s.*")
      // try_divide: an all-null/empty field has total=0 and ANSI mode
      // would otherwise throw DIVIDE_BY_ZERO; share is NULL there
      .withColumn("share_uniq",
        round(lit(100.0) * try_divide(col("n_uniq"), col("total")), 4))
      .withColumn("is_uniq", col("n_uniq") === col("total"))
      .withColumn("is_dictkey", col("share_uniq") < dictShare)
      .orderBy("field")
  }

  /** `undatum flatten` (undatum/cmds/textproc.py:18-54): leaf-path
    * occurrence counts across all records — one output row per leaf
    * key-path with the number of non-null values.
    */
  def flattenCounts(df: DataFrame): DataFrame = {
    // one agg, one scan (was one scan PER leaf path), explode-unpivot;
    // columns resolve via backticked segments so a field name holding
    // a literal dot counts the right field
    val segs = headerPathSegments(df.schema)
    val aggCols = segs.zipWithIndex.map { case (p, i) =>
      count(colForSegments(p)).cast(LongType).as(s"__n_$i")
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    val structs = segs.zipWithIndex.map { case (p, i) =>
      struct(lit(p.mkString(".")).as("field"), col(s"__n_$i").as("n"))
    }
    row.select(explode(array(structs: _*)).as("s")).select("s.*")
      .orderBy("field")
  }

  /** Per-value type guessing — undatum/utils.py:113-151
    * `guess_datatype`: empty, int (with uint8/uint16/uint32 subtype
    * via guess_int_size, utils.py:106-111 — the reference uses
    * strict `<` against 255/65535, an off-by-one vs the byte max that
    * we replicate for fidelity), float, date (fixed ISO pattern in
    * place of the qddate library), else str. The reference's numstr
    * branch (digits with leading zero) is documented unreachable
    * (utils.py:131 compares a string to int 0), so values like "007"
    * classify as int here too.
    */
  /** Date-shaped string patterns, most-specific first — the fixed-ISO
    * round-1 detector widened to the common qddate pattern families
    * (the reference's qddate fallback tries pattern lists —
    * utils.py:142-147, constants.py:2-4): ISO, dotted European,
    * slashed US, slashed ISO. Pure regex shape checks, portable to
    * any engine's regex (the oracle uses the same set).
    */
  val datePatterns: Seq[String] = Seq(
    "^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "^[0-9]{2}\\.[0-9]{2}\\.[0-9]{4}$",
    "^[0-9]{2}/[0-9]{2}/[0-9]{4}$",
    "^[0-9]{4}/[0-9]{2}/[0-9]{2}$")

  def guessType(c: Column): Column =
    // null/empty decided here; everything else is ONE native byte
    // scan (functions.TypeGuess) — the declarative form below ran 7
    // regexes per value and made the type queries regex-bound
    when(c.isNull || c === "", "empty")
      .otherwise(graft.functions.TypeGuess.typeGuess(c))

  /** Declarative regex reference formulation (test-only; the property
    * test pins the native kernel to it value-for-value).
    */
  def guessTypeRegex(c: Column): Column = {
    val isDate = datePatterns.map(c.rlike).reduce(_ || _)
    when(c.isNull || c === "", "empty")
      .when(c.rlike("^[0-9]+$"),
        when(c.cast("long") < 255, "uint8")
          .when(c.cast("long") < 65535, "uint16")
          .otherwise("uint32"))
      .when(c.rlike("^-?[0-9]+\\.[0-9]+$"), "float")
      .when(isDate, "date")
      .otherwise("str")
  }

  /** Candidate datetime formats for `dateFormatScores`, Spark pattern
    * syntax. Mirrors the role of the reference's qddate pattern bank
    * (undatum/cmds/statistics.py:5,27 — qddate ships hundreds of
    * pattern families; this bank covers its most common ones: ISO,
    * dotted/dashed/slashed EU, US slash, compact digits, English
    * month-name forms, 2-digit years, and ISO datetime).
    */
  val dateFormats: Seq[String] = graft.functions.DateBank.formats

  /** Score candidate date formats for a string field: non-null
    * parse counts per format, one scan. The highest-scoring format is
    * the field's detected date format — the distributed form of
    * qddate's per-value pattern cascade. For the default bank the scan
    * runs the native [[graft.functions.DateBank]] bitmask kernel
    * (feature-guarded: ~1-2 parse attempts/row instead of 11, match
    * set identical by construction — property-asserted against the
    * declarative form); a custom bank takes the declarative path.
    */
  def dateFormatScores(df: DataFrame, field: String,
                       formats: Seq[String] = dateFormats): DataFrame =
    if (formats == dateFormats) {
      graft.functions.DateBank.register(df.sparkSession)
      val m = call_function("date_bank_mask", col(field).cast(StringType))
      val aggCols = formats.indices.map(i =>
        sum(shiftright(m, i).bitwiseAND(lit(1))).cast(LongType).as(s"__c_$i"))
      scoresTail(df.agg(aggCols.head, aggCols.tail: _*), formats)
    } else dateFormatScoresDeclarative(df, field, formats)

  /** Score the 22-format WIDE bank ([[graft.functions.DateBank.formatsWide]]:
    * the 11 defaults + ISO-T/minute datetimes, the US 12-hour clock,
    * full English month names, and the Russian genitive month-name
    * shapes qddate generates). Kernel-only: the ru-locale formats have
    * no `try_to_timestamp` spelling (no locale arg), so the semantic
    * spec here is the unguarded [[graft.functions.DateBank.parsesWide]]
    * formatter walk, which DateBankSpec property-asserts the guarded
    * kernel against row-by-row.
    */
  def dateFormatScoresWide(df: DataFrame, field: String): DataFrame = {
    graft.functions.DateBank.register(df.sparkSession)
    val fmts = graft.functions.DateBank.formatsWide
    val m = call_function("date_bank_mask_wide", col(field).cast(StringType))
    val aggCols = fmts.indices.map(i =>
      sum(shiftright(m, i).bitwiseAND(lit(1))).cast(LongType).as(s"__c_$i"))
    scoresTail(df.agg(aggCols.head, aggCols.tail: _*), fmts)
  }

  /** The one-`try_to_timestamp`-per-format reference form — kept as
    * the semantic spec the native kernel is property-tested against.
    */
  def dateFormatScoresDeclarative(df: DataFrame, field: String,
                                  formats: Seq[String] = dateFormats): DataFrame = {
    val c = col(field).cast(StringType)
    val aggCols = formats.zipWithIndex.map { case (fmt, i) =>
      count(try_to_timestamp(c, lit(fmt))).cast(LongType).as(s"__c_$i")
    }
    scoresTail(df.agg(aggCols.head, aggCols.tail: _*), formats)
  }

  private def scoresTail(row: DataFrame, formats: Seq[String]): DataFrame = {
    val structs = formats.zipWithIndex.map { case (fmt, i) =>
      struct(lit(fmt).as("fmt"), col(s"__c_$i").as("n_parsed"))
    }
    row.select(explode(array(structs: _*)).as("s")).select("s.*")
      .orderBy("fmt")
  }

  /** Type histogram + majority vote per field — the per-field type
    * decision of `undatum stats` (statistics.py:117-125: drop
    * `empty`, mixed types -> str).
    */
  def typeHistogram(df: DataFrame, fields: Seq[String]): DataFrame = {
    // register on the DataFrame's OWN session — a charset-clone df
    // (Converter.read exotic encodings) has an empty registry, and
    // the helper's active-session registration would miss it
    graft.functions.TypeGuess.register(df.sparkSession)
    // one scan with an F-way explode (was F scans via unionAll)
    val structs = fields.map { f =>
      struct(lit(f).as("field"),
        guessType(resolveField(df, f).cast(StringType)).as("vtype"))
    }
    df.select(explode(array(structs: _*)).as("s")).select("s.*")
      .groupBy("field", "vtype").agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy("field", "vtype")
  }

  /** Final per-field type: drop `empty`; a single surviving type wins,
    * any mixture degrades to `str` (statistics.py:117-125).
    */
  def fieldTypes(df: DataFrame, fields: Seq[String]): DataFrame =
    typeHistogram(df, fields)
      .where(col("vtype") =!= "empty")
      .groupBy("field")
      .agg(when(countDistinct(col("vtype")) === 1, max(col("vtype")))
        .otherwise(lit("str")).as("field_type"))
      .orderBy("field")

  /** Deterministic stratified sample: exactly min(k, |group|) rows per
    * value of `field`, selected by smallest md5 of the id column — a
    * training-pipeline quota sampler (cap each source's contribution)
    * that is reproducible across engines and runs (no RNG state; any
    * engine with md5 picks the identical rows). One shuffle on the
    * stratum key; per-group top-k, never a full sort.
    */
  def stratifiedSample(df: DataFrame, field: String, idCol: String,
                       k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(field).orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Scale form of [[stratifiedSample]], identical rows: the per-group
    * window above sorts ALL of a dominant group's rows in one task.
    * Here each (group, md5-first-byte) bucket takes its own local
    * top-k in parallel (a superset of the group's global top-k, since
    * the global k smallest md5 keys live in at most k buckets), then
    * the final rank runs over at most 256·k survivors per group.
    */
  def stratifiedSampleBucketed(df: DataFrame, field: String, idCol: String,
                               k: Int): DataFrame = {
    val key = md5(col(idCol).cast(StringType))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(field), substring(key, 1, 2))
      .orderBy(key, col(idCol))
    val wGlobal = org.apache.spark.sql.expressions.Window
      .partitionBy(field).orderBy(key, col(idCol))
    df.withColumn("__lrn", row_number().over(wLocal))
      .where(col("__lrn") <= k)
      .withColumn("__rn", row_number().over(wGlobal))
      .where(col("__rn") <= k)
      .drop("__lrn", "__rn")
  }

  /** Token-budget domain mixing — the corpus-mixing stage of a
    * training-data pipeline (up/down-weight web vs books vs code):
    * each source gets budget_s = floor(weight_s / Σweights × total)
    * tokens and contributes its docs in md5(id) order until the
    * PRE-doc cumulative token count reaches that budget (the
    * straddling doc is kept — the budget is a floor, and downstream
    * concat-and-chunk packing trims the tail). Deterministic across
    * engines and runs; sources absent from `weights` contribute
    * nothing.
    *
    * Scale shape: the window sorts only (source, id, n_tok) scalars —
    * the wide doc rows rejoin by id afterwards — and the budget table
    * is broadcast. One shuffle on source over scalars; at 10^12 docs
    * a hot source serializes its cumsum, so pre-aggregate to (source,
    * md5-bucket) subtotals first if one source dominates.
    */
  def mixSample(df: DataFrame, idCol: String, tokCol: String,
                srcCol: String, weights: Map[String, Double],
                totalTokenBudget: Long): DataFrame = {
    val wsum = weights.values.sum
    require(wsum > 0, "weights must have positive mass")
    mixSampleBudgets(df, idCol, tokCol, srcCol,
      weights.map { case (s, w) =>
        s -> math.floor(w / wsum * totalTokenBudget).toLong
      })
  }

  /** The shared selection rule behind [[mixSample]] and
    * [[mixSampleTemperature]]: per-source md5(id)-order token cumsum,
    * keep while under the source's explicit integer budget.
    */
  def mixSampleBudgets(df: DataFrame, idCol: String, tokCol: String,
                       srcCol: String, budgetBySource: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = budgetBySource.toSeq.toDF(srcCol, "__budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(srcCol).orderBy(md5(col(idCol).cast(StringType)), col(idCol))
    val kept = df.select(col(srcCol), col(idCol), col(tokCol))
      .join(broadcast(budgets), srcCol)
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .where(col("__cum") - col(tokCol) < col("__budget"))
      .select(col(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** Temperature-scaled source quotas (the mT5/Gopher/PaLM
    * multi-source sampling knob): a source's budget share is
    * proportional to (its natural token share)^alpha — alpha=1 keeps
    * natural proportions, alpha -> 0 approaches uniform, upweighting
    * low-resource sources. ONE count aggregation derives the shares;
    * they quantize onto an integer micro-weight lattice
    * (floor(share^alpha * 1e9 + 0.5)) and the budgets are then pure
    * BIGINT arithmetic (m * budget / sum(m), BigInt-safe), so the SQL
    * oracle reproduces every budget exactly with no float-summation-
    * order sensitivity. Selection rides [[mixSampleBudgets]].
    */
  def mixSampleTemperature(df: DataFrame, idCol: String, tokCol: String,
                           srcCol: String, alpha: Double,
                           totalTokenBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val rows = df.groupBy(col(srcCol))
      .agg(sum(col(tokCol)).cast(LongType).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = rows.map(_._2).sum
    require(total > 0, "corpus has no tokens")
    val micro = rows.map { case (s, t) =>
      s -> math.floor(math.pow(t.toDouble / total, alpha) * 1e9 + 0.5).toLong
    }
    val msum = micro.map(_._2).sum
    mixSampleBudgets(df, idCol, tokCol, srcCol,
      micro.map { case (s, m) =>
        s -> (BigInt(m) * totalTokenBudget / msum).toLong
      }.toMap)
  }

  /** Scale form of [[mixSample]], identical results: the per-source
    * window above sorts ALL of a source's rows in one task, which
    * serializes on a dominant source at 10^12 docs. Here the md5
    * ordering is split at its first byte into 256 buckets (the prefix
    * order is preserved across buckets by construction), per-bucket
    * subtotals roll up in a 256-rows-per-source window, and each
    * bucket's global cumsum = its offset + a within-bucket cumsum —
    * so the big sort runs at source×256 parallelism and the only
    * serialized window touches 256 scalar rows per source.
    */
  def mixSampleBucketed(df: DataFrame, idCol: String, tokCol: String,
                        srcCol: String, weights: Map[String, Double],
                        totalTokenBudget: Long): DataFrame = {
    val wsum = weights.values.sum
    require(wsum > 0, "weights must have positive mass")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = weights.toSeq
      .map { case (s, w) => (s, math.floor(w / wsum * totalTokenBudget).toLong) }
      .toDF(srcCol, "__budget")
    val keyed = df.select(col(srcCol), col(idCol), col(tokCol))
      .join(broadcast(budgets), srcCol)
      .withColumn("__k", md5(col(idCol).cast(StringType)))
      .withColumn("__bkt", substring(col("__k"), 1, 2))
    val subtotals = keyed.groupBy(col(srcCol), col("__bkt"))
      .agg(sum(col(tokCol)).as("__bktTok"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("__bkt"))
    val offsets = subtotals.withColumn("__off",
      coalesce(sum(col("__bktTok")).over(wB) - col("__bktTok"), lit(0L)))
      .select(col(srcCol), col("__bkt"), col("__off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol), col("__bkt")).orderBy(col("__k"), col(idCol))
    val kept = keyed
      .join(offsets, Seq(srcCol, "__bkt"))
      .withColumn("__cum", col("__off") + sum(col(tokCol)).over(wIn))
      .where(col("__cum") - col(tokCol) < col("__budget"))
      .select(col(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** `undatum validate` (undatum/cmds/validator.py:47-119): rule over
    * a column; modes stats / invalid / all.
    */
  def validateStats(df: DataFrame, rule: Column): DataFrame =
    df.agg(
      count(lit(1)).cast(LongType).as("total"),
      sum(when(rule, 0).otherwise(1)).cast(LongType).as("invalid"),
      round(lit(100.0) * sum(when(rule, 0).otherwise(1)) / count(lit(1)), 4)
        .as("share_invalid"))

  def validateInvalid(df: DataFrame, rule: Column): DataFrame =
    // NOT(NULL) is NULL, which filter drops — but validateStats counts
    // a NULL-evaluating rule as invalid, and the two modes of the same
    // command must agree on which rows are invalid
    df.filter(!coalesce(rule, lit(false)))
}
