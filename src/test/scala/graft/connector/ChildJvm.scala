package graft.connector

/** Launch parameters for the plain-JVM children the cross-process specs
  * fork (CasRaceTwoJvmSpec, KillMidCommitSpec): the java binary of THIS
  * JVM and THIS JVM's classpath — already containing the compiled main and
  * test classes plus the Spark/Hadoop jars — instead of hardcoded
  * cwd-relative paths that break under a different working directory or
  * output layout.
  */
private[connector] object ChildJvm {
  def javaBin: String = s"${System.getProperty("java.home")}/bin/java"
  def classpath: String = System.getProperty("java.class.path")
}
