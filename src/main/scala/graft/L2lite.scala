package graft

/** nGQL → GQL conversion CLI — parity with the reference's `l2lite` tool
  * (/root/reference/tool/l2lite.cpp: `l2lite -fngql -s in.ngql -o out.lite`).
  * `runMain graft.L2lite <in.ngql> [out.gql]` — stdout when no output path.
  * No Spark session: pure text translation via [[gql.Ngql]]. */
object L2lite {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: L2lite <in.ngql> [out.gql]")
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val out = gql.Ngql.convertScript(src)
    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    else println(out)
  }
}
