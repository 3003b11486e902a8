package graft.core

/** Ships the session's Hadoop configuration into executor-side closures
  * (Configuration itself is not java-Serializable). Without this, a task
  * that calls `path.getFileSystem(new Configuration())` sees only
  * classpath defaults — every session-configured filesystem (object-store
  * credentials, endpoints, custom schemes) silently vanishes on the
  * executor. Same shape as Spark's own internal SerializableConfiguration
  * (which is private[spark]).
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
