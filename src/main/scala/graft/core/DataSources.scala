package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Cluster `data_sources` config (conf/clusters/<id>.json; reference
  * classifier/classifier.py:82-114): service -> resource -> allowed
  * log-SOURCE prefixes. A payload's candidate schemas are the declared
  * schemas (in order — first-match classification depends on it) whose
  * `source:subtype` prefix is listed for the payload's (service, resource).
  * Undeclared service or resource is a configuration error, exactly as the
  * reference raises ConfigError. */
object DataSources {

  private val mapper = new ObjectMapper()

  /** Parse the `data_sources` object of one cluster file. */
  def loadClusterJson(json: String): Map[String, Map[String, Seq[String]]] = {
    val root = mapper.readTree(json)
    val ds = Option(root.get("data_sources")).getOrElse(
      throw new IllegalArgumentException("cluster conf has no data_sources"))
    ds.properties().asScala.map { svc =>
      svc.getKey -> svc.getValue.properties().asScala.map { res =>
        res.getKey -> res.getValue.elements().asScala.map(_.asText).toSeq
      }.toMap
    }.toMap
  }

  /** logs-for-resource (classifier.py:82-114): schemas whose source prefix
    * is declared for (service, resource), declaration order preserved. */
  def candidates(schemas: Seq[LogSchema],
      dataSources: Map[String, Map[String, Seq[String]]],
      service: String, resource: String): Seq[LogSchema] = {
    val resources = dataSources.getOrElse(service,
      throw new IllegalArgumentException(
        s"Service [$service] not declared in sources configuration for resource [$resource]"))
    val allowed = resources.getOrElse(resource,
      throw new IllegalArgumentException(
        s"Resource [$resource] not declared in sources configuration for service [$service]"))
    schemas.filter(s => allowed.contains(s.name.split(':').head))
  }
}
