package graft.ops

/** CLI-style coarse-channel range specification
  * (/root/reference/src/cli.rs:154-240).
  *
  *  - [[parse]]: `"1-10, 20-30, 40"` → ranges, one `(start, end)` per
  *    comma-separated item; a bare number is a singleton range; any
  *    malformed item rejects the whole spec (the reference's
  *    `InvalidRangeSpecifier`).
  *  - [[fromIdxs]]: collapse a sorted index list into maximal
  *    contiguous ranges (the reference's `from_idxs`, which a
  *    picket-fence observation uses to discover its islands).
  */
object ChannelRanges {

  def parse(s: String): Either[String, Seq[(Int, Int)]] = {
    val items = s.split(',').toSeq
    val parsed = items.map { item =>
      item.split('-').map(_.trim).toSeq match {
        case Seq(a, b) =>
          (a.toIntOption, b.toIntOption) match {
            case (Some(x), Some(y)) => Right((x, y))
            case _ => Left(s"invalid channel range: $item")
          }
        case Seq(a) =>
          a.toIntOption match {
            case Some(x) => Right((x, x))
            case None => Left(s"invalid channel range: $item")
          }
        case _ => Left(s"invalid channel range: $item")
      }
    }
    parsed.collectFirst { case Left(e) => e } match {
      case Some(e) => Left(e)
      case None => Right(parsed.collect { case Right(r) => r })
    }
  }

  def fromIdxs(idxs: Seq[Int]): Seq[(Int, Int)] = {
    require(idxs.nonEmpty, "empty index list")
    val out = Seq.newBuilder[(Int, Int)]
    var start = idxs.head
    var end = start
    idxs.tail.foreach { i =>
      if (i == end + 1) end = i
      else { out += ((start, end)); start = i; end = i }
    }
    out += ((start, end))
    out.result()
  }
}
