package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.clustering.{GaussianMixture, GaussianMixtureModel, KMeans}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{PCA, StringIndexer, StringIndexerModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-then-classify meta-estimator (reference `README.md:1548-1687`,
  * SURVEY §2.9 M14): a clusterer partitions the space; clusters that are
  * big enough and contain both classes each get their own RandomForest; the
  * rest are scored by their majority class.
  *
  * Two clusterer modes, matching the reference's two variants:
  *   - `kmeans`: KMeans(k, initSteps=25, maxIter=100) on `featuresCol`
  *     (reference `README.md:1548`);
  *   - `gm`: PCA(pcaK) → GaussianMixture(k, maxIter=150) — the reference's
  *     GM-on-PCA-features variant (`README.md:1489-1494,1831-1844,
  *     1925-1943`).
  *
  * Spark-native re-expression of the notebook's loop:
  *   - cluster composition = one groupBy (not a crosstab collect);
  *   - per-cluster models are fitted from a driver loop (unavoidable —
  *     model fitting is iterative) over FILTERED views of the cached
  *     training frame;
  *   - scoring is a union of per-cluster transforms plus a map-lookup
  *     expression for hardcoded clusters — evaluated as ONE DataFrame over
  *     ONE cached clustering pass (the clustered frame is cached so the
  *     K+1 union branches share a single InMemoryTableScan instead of
  *     re-scoring the clusterer per branch).
  *
  * The probability remap (reference `udf_remap_prob`, `README.md:1679-1680`)
  * is `vector_to_array(probability)[i]` with i chosen from the per-cluster
  * StringIndexer's label order — a native expression, not a UDF.
  */
class ClusteredClassifier(
    val k: Int = 8,
    val featuresCol: String = "features",
    val labelCol: String = "labels2",
    val minClusterSize: Long = 25L,
    val numTrees: Int = 500,
    val maxDepth: Int = 20,
    val seed: Long = 4667979835606274383L,
    val clusterMode: String = "kmeans",
    val pcaK: Int = 2,
    val kmeansInitSteps: Int = 25) {

  require(clusterMode == "kmeans" || clusterMode == "gm",
    s"clusterMode must be kmeans|gm, got $clusterMode")

  /** Columns the clusterer adds besides `cluster` (dropped after scoring). */
  private val auxCols = Seq("pca_features", "gm_cluster_prob")

  private def clusterStages(): Array[PipelineStage] = clusterMode match {
    case "kmeans" => Array(
      new KMeans().setK(k).setInitSteps(kmeansInitSteps).setMaxIter(100)
        .setSeed(seed).setFeaturesCol(featuresCol).setPredictionCol("cluster"))
    case "gm" => Array(
      new PCA().setK(pcaK).setInputCol(featuresCol).setOutputCol("pca_features"),
      new GaussianMixture().setK(k).setMaxIter(150).setSeed(seed)
        .setFeaturesCol("pca_features").setPredictionCol("cluster")
        .setProbabilityCol("gm_cluster_prob"))
  }

  def fit(train: DataFrame): ClusteredClassifierModel = {
    val clusterModel = new Pipeline().setStages(clusterStages()).fit(train)
    val clustered = clusterModel.transform(train)
      .drop(auxCols: _*)
      .cache()

    // cluster composition: one aggregation, k tiny rows to the driver
    val comp = clustered.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === "attack", 1L).otherwise(0L)).as("attack"),
        sum(when(col(labelCol) =!= "attack", 1L).otherwise(0L)).as("normal"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val (trainable, hardcoded) = comp.partition { case (_, (n, a, nm)) =>
      n > minClusterSize && a > 0 && nm > 0
    }

    val models = trainable.keys.toSeq.sorted.map { c =>
      val sub = clustered.filter(col("cluster") === c)
      val pipeline = new Pipeline().setStages(Array(
        new StringIndexer().setInputCol(labelCol).setOutputCol("label_idx")
          .setStringOrderType("frequencyDesc"),
        new RandomForestClassifier().setLabelCol("label_idx")
          .setFeaturesCol(featuresCol).setNumTrees(numTrees).setMaxDepth(maxDepth)
          .setFeatureSubsetStrategy("sqrt").setSeed(seed)))
      c -> pipeline.fit(sub)
    }.toMap

    // majority-class prob for clusters too small/pure to train
    // (reference cluster_mapping, README.md:1603-1615)
    val mapping = hardcoded.map { case (c, (_, a, nm)) =>
      c -> (if (a > nm) 1.0 else 0.0)
    }

    clustered.unpersist()
    new ClusteredClassifierModel(clusterModel, models, mapping, labelCol, auxCols)
  }
}

class ClusteredClassifierModel(
    val clusterModel: PipelineModel,
    val clusterModels: Map[Int, PipelineModel],
    val hardcodedProb: Map[Int, Double],
    val labelCol: String,
    private val auxCols: Seq[String]) extends Serializable {

  /** Score: returns the input plus (cluster, prob) where prob = P(attack).
    * The clusterer scores the input ONCE into a cached frame; the union's
    * K+1 branches all read that cache (visible as one InMemoryTableScan
    * reused per branch in `.explain`). Callers holding the result long-term
    * should `unpersist()` via [[clearScoringCache]] when done.
    *
    * CACHE CONTRACT — one scoring cache at a time: each call releases the
    * PREVIOUS call's scoring cache before caching the new frame. A
    * DataFrame returned by an earlier `transform` stays correct but loses
    * its cache backing, so later actions on it silently re-run the full
    * clustering+RF scoring pass. Materialize (e.g. `count()`/write) or copy
    * a result you need before scoring another frame — `NslKddFlow` does
    * exactly this with its `cvPreds.count()`.
    */
  def transform(df: DataFrame): DataFrame = {
    // release the previous scoring cache BEFORE caching the new frame:
    // unpersisting after would remove the just-created entry when df is the
    // same frame as last time (CacheManager dedups by canonicalized plan),
    // and it would kill a not-yet-materialized prior cache mid-use
    lastScored.foreach(_.unpersist())
    val clustered = clusterModel.transform(df).drop(auxCols: _*).cache()
    lastScored = Some(clustered)
    val branches = clusterModels.toSeq.sortBy(_._1).map { case (c, pm) =>
      // index of "attack" in this cluster's label order (reference maj_label
      // check — frequencyDesc can flip the class index per cluster)
      val labels = pm.stages.head.asInstanceOf[StringIndexerModel].labelsArray.head
      val attackIdx = labels.indexOf("attack") max 0
      pm.transform(clustered.filter(col("cluster") === c))
        .withColumn("prob", vector_to_array(col("probability"))(attackIdx))
        .drop("label_idx", "rawPrediction", "probability", "prediction")
    }
    val hardcodedRows = {
      val m = typedlit(hardcodedProb)
      clustered.filter(!col("cluster").isin(clusterModels.keys.toSeq: _*))
        .withColumn("prob", coalesce(element_at(m, col("cluster")), lit(0.0)))
    }
    (branches :+ hardcodedRows).reduce(_ unionByName _)
  }

  @transient private var lastScored: Option[DataFrame] = None

  /** The fitted GaussianMixture inside the clusterer pipeline, if this model
    * was trained in `gm` mode (None in kmeans mode).
    */
  def gaussianMixture: Option[GaussianMixtureModel] =
    clusterModel.stages.collectFirst { case g: GaussianMixtureModel => g }

  /** GM mixing weights (k values summing to 1) — the introspection the
    * reference performs right after the GM fit (`README.md:1841-1844`,
    * `model.weights`). Empty in kmeans mode.
    */
  def gmWeights: Array[Double] =
    gaussianMixture.map(_.weights).getOrElse(Array.empty)

  /** One row per mixture component with its mean vector and covariance
    * matrix — the reference's `model.gaussiansDF` (`README.md:1841-1844`).
    */
  def gmGaussians: Option[DataFrame] = gaussianMixture.map(_.gaussiansDF)

  /** Release the cached clustering pass from the most recent [[transform]]. */
  def clearScoringCache(): Unit = {
    lastScored.foreach(_.unpersist())
    lastScored = None
  }

  /** Persist to `path` (any Hadoop-visible filesystem): the clusterer and
    * per-cluster pipelines via spark.ml persistence, the driver-side maps as
    * a small metadata JSON.
    */
  def save(path: String): Unit = {
    clusterModel.write.overwrite().save(s"$path/clusterer")
    clusterModels.foreach { case (c, pm) =>
      pm.write.overwrite().save(s"$path/cluster_$c")
    }
    val meta = {
      val hp = hardcodedProb.map { case (c, p) => s""""$c": $p""" }.mkString("{", ", ", "}")
      val cs = clusterModels.keys.toSeq.sorted.mkString("[", ", ", "]")
      val aux = auxCols.map(a => s""""$a"""").mkString("[", ", ", "]")
      s"""{"labelCol": "$labelCol", "clusters": $cs, "hardcodedProb": $hp, "auxCols": $aux}"""
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new org.apache.hadoop.fs.Path(s"$path/metadata.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }
}

object ClusteredClassifierModel {

  /** Load a model previously written by [[ClusteredClassifierModel.save]]. */
  def load(path: String): ClusteredClassifierModel = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new org.apache.hadoop.fs.Path(s"$path/metadata.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // minimal parse of the flat metadata JSON written by save()
    def field(name: String): String = {
      val m = (s""""$name":\\s*("[^"]*"|\\{[^}]*\\}|\\[[^\\]]*\\])""").r
      m.findFirstMatchIn(meta).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"metadata.json missing $name"))
    }
    val labelCol = field("labelCol").stripPrefix("\"").stripSuffix("\"")
    val clusters = field("clusters").stripPrefix("[").stripSuffix("]").trim match {
      case "" => Seq.empty[Int]
      case s => s.split(",").map(_.trim.toInt).toSeq
    }
    val hardcoded = field("hardcodedProb").stripPrefix("{").stripSuffix("}").trim match {
      case "" => Map.empty[Int, Double]
      case s => s.split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toDouble
      }.toMap
    }
    val aux = field("auxCols").stripPrefix("[").stripSuffix("]").trim match {
      case "" => Seq.empty[String]
      case s => s.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    }
    val clusterer = PipelineModel.load(s"$path/clusterer")
    val perCluster = clusters.map(c => c -> PipelineModel.load(s"$path/cluster_$c")).toMap
    new ClusteredClassifierModel(clusterer, perCluster, hardcoded, labelCol, aux)
  }
}
