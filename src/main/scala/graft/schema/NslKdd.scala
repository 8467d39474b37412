package graft.schema

import org.apache.spark.sql.types._

/** NSL-KDD connection-record data model.
  *
  * The reference (thinline72/nsl-kdd, `README.md:91-108`) declares 42 column
  * names (41 features + `labels`) over a headerless 43-field CSV; the trailing
  * "difficulty" score is dropped at load (`README.md:115-158`). Column classes
  * (nominal / binary / numeric) follow `README.md:102-108`.
  */
object NslKdd {

  /** 41 feature names + `labels`, in file order (reference `README.md:91-100`). */
  val colNames: Seq[String] = Seq(
    "duration", "protocol_type", "service", "flag", "src_bytes",
    "dst_bytes", "land", "wrong_fragment", "urgent", "hot", "num_failed_logins",
    "logged_in", "num_compromised", "root_shell", "su_attempted", "num_root",
    "num_file_creations", "num_shells", "num_access_files", "num_outbound_cmds",
    "is_host_login", "is_guest_login", "count", "srv_count", "serror_rate",
    "srv_serror_rate", "rerror_rate", "srv_rerror_rate", "same_srv_rate",
    "diff_srv_rate", "srv_diff_host_rate", "dst_host_count", "dst_host_srv_count",
    "dst_host_same_srv_rate", "dst_host_diff_srv_rate", "dst_host_same_src_port_rate",
    "dst_host_srv_diff_host_rate", "dst_host_serror_rate", "dst_host_srv_serror_rate",
    "dst_host_rerror_rate", "dst_host_srv_rerror_rate", "labels")

  private val nominalIdx = Set(1, 2, 3)
  private val binaryIdx  = Set(6, 11, 13, 14, 20, 21)

  val nominalCols: Seq[String] = nominalIdx.toSeq.sorted.map(colNames)
  val binaryCols: Seq[String]  = binaryIdx.toSeq.sorted.map(colNames)
  val numericCols: Seq[String] =
    (0 until 41).filterNot(i => nominalIdx(i) || binaryIdx(i)).map(colNames)

  /** String-typed columns; everything else in the 42 is double. */
  val stringCols: Set[String] = nominalCols.toSet + "labels"

  /** Explicit 43-field read schema: 42 named fields + trailing `difficulty`,
    * which the loader drops (reference semantics, `SURVEY.md` §1.2). Types are
    * declared up front so the CSV reader casts during the scan — no post-cast
    * projection needed (reference does a 42-way cast-select, `README.md:117-158`).
    */
  val readSchema: StructType = StructType(
    colNames.map { c =>
      StructField(c, if (stringCols(c)) StringType else DoubleType, nullable = true)
    } :+ StructField("difficulty", DoubleType, nullable = true))

  /** 40-entry attack-name → 5-class category map (reference `README.md:173-218`;
    * public NSL-KDD taxonomy: 10 DoS, 6 Probe, 15 R2L, 8 U2R + normal).
    */
  val attackDict: Map[String, String] = Map(
    "normal" -> "normal",
    // DoS
    "back" -> "DoS", "land" -> "DoS", "neptune" -> "DoS", "pod" -> "DoS",
    "smurf" -> "DoS", "teardrop" -> "DoS", "mailbomb" -> "DoS",
    "apache2" -> "DoS", "processtable" -> "DoS", "udpstorm" -> "DoS",
    // Probe
    "ipsweep" -> "Probe", "nmap" -> "Probe", "portsweep" -> "Probe",
    "satan" -> "Probe", "mscan" -> "Probe", "saint" -> "Probe",
    // R2L
    "ftp_write" -> "R2L", "guess_passwd" -> "R2L", "imap" -> "R2L",
    "multihop" -> "R2L", "phf" -> "R2L", "spy" -> "R2L",
    "warezclient" -> "R2L", "warezmaster" -> "R2L", "sendmail" -> "R2L",
    "named" -> "R2L", "snmpgetattack" -> "R2L", "snmpguess" -> "R2L",
    "xlock" -> "R2L", "xsnoop" -> "R2L", "worm" -> "R2L",
    // U2R
    "buffer_overflow" -> "U2R", "loadmodule" -> "U2R", "perl" -> "U2R",
    "rootkit" -> "U2R", "httptunnel" -> "U2R", "ps" -> "U2R",
    "sqlattack" -> "U2R", "xterm" -> "U2R")

  val labels2Values: Seq[String] = Seq("normal", "attack")
  val labels5Values: Seq[String] = Seq("normal", "DoS", "Probe", "R2L", "U2R")
}
