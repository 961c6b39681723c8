package graft.plans

import com.esotericsoftware.kryo.Kryo
import org.apache.spark.serializer.KryoRegistrator

/** Kryo registration for the RDD-based plans (VERDICT r2 item 5): without
  * it the CSR path ships Java-serialized boxed tuples through every
  * superstep's reduceByKey/join. Registered classes cover the CSR block
  * structure and the rank/contribution tuples.
  */
class GraftKryoRegistrator extends KryoRegistrator {
  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[CsrPageRank.Block])
    kryo.register(classOf[Array[Long]])
    kryo.register(classOf[Array[Int]])
    kryo.register(classOf[Array[Double]])
    kryo.register(classOf[Tuple2[Any, Any]])
    kryo.register(classOf[java.lang.Long])
    kryo.register(classOf[java.lang.Double])
    kryo.register(scala.reflect.classTag[Unit].runtimeClass)
  }
}
