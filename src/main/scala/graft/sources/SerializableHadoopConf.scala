package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper around a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`), so executor-side filesystem work
  * — the deletion-vector find pass writing sidecars from tasks — sees
  * the SESSION's filesystem settings (credentials, scheme impls)
  * instead of a bare `new Configuration()`. Same recipe as Spark's own
  * private `SerializableConfiguration`, re-implemented here because
  * that class is `private[spark]`.
  */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
