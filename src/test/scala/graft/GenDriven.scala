package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded property-test driver over raw ScalaCheck generators (the
  * scalatest-plus bridge isn't available offline). Deterministic: case i
  * uses seed i. */
trait GenDriven {
  def forAllSampled[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
}
