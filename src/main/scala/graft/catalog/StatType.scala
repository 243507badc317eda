package graft.catalog

/** Statistical types of population variables (reference:
  * src/schema.py:42-53). `Key` and `Ignore` are the pseudo-types the
  * guesser may assign (reference: src/guess.py). */
sealed trait StatType {
  def name: String = StatType.nameOf(this)
}

object StatType {
  case object Boolean          extends StatType
  case object Counts           extends StatType
  case object Cyclic           extends StatType
  case object Magnitude        extends StatType
  case object Nominal          extends StatType
  case object Numerical        extends StatType
  case object NumericalRanged  extends StatType
  case object UnboundedNominal extends StatType
  case object Key              extends StatType
  case object Ignore           extends StatType

  val all: Seq[StatType] = Seq(Boolean, Counts, Cyclic, Magnitude, Nominal,
    Numerical, NumericalRanged, UnboundedNominal, Key, Ignore)

  def nameOf(st: StatType): String = st match {
    case Boolean          => "boolean"
    case Counts           => "counts"
    case Cyclic           => "cyclic"
    case Magnitude        => "magnitude"
    case Nominal          => "nominal"
    case Numerical        => "numerical"
    case NumericalRanged  => "numericalranged"
    case UnboundedNominal => "unbounded_nominal"
    case Key              => "key"
    case Ignore           => "ignore"
  }

  /** Case-insensitive parse; reference casefolds stattype names
    * (src/util.py:77-79). */
  def parse(s: String): Option[StatType] = {
    val n = s.trim.toUpperCase.toLowerCase
    all.find(st => nameOf(st) == n)
  }

  /** Variables a generative model actually models (not key/ignore). */
  def isModeled(st: StatType): Boolean = st != Key && st != Ignore

  /** Stattypes modeled with categorical (dictionary-coded) components
    * (reference `_is_nominal`, cgpm default dists :1905-1912). */
  def isNominal(st: StatType): Boolean = st match {
    case Nominal | UnboundedNominal | Boolean => true
    case _ => false
  }
}
