package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Jackson codec shared by all metadata files (snapshots, manifests,
  * schemas). JSON keeps the format debuggable with plain tools; the
  * files are small driver-side metadata, never row data.
  */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def write[T](v: T): String = mapper.writeValueAsString(v)

  def read[T](s: String, clazz: Class[T]): T = mapper.readValue(s, clazz)
}
