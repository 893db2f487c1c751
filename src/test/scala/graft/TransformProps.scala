package graft

import graft.transforms.TrelloTransforms
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the scalar layer (SURVEY.md §5.3):
  * invariants the golden pairs can't cover exhaustively. */
object TransformProps extends Properties("transforms") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private val amount: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 999).map(_.toString),
    Gen.chooseNum(0, 999).flatMap(w => Gen.chooseNum(1, 99).map(f => s"$w.$f")),
    Gen.chooseNum(1, 99).map(f => s".$f"))

  property("bounty amount round-trips through the reference regex") =
    forAll(nameGen, amount) { (n, a) =>
      TrelloTransforms.parseChecklistItem(s"$n ($a Dash)").amount.contains(a)
    }

  property("bounty-free names never yield an amount") =
    forAll(nameGen) { n =>
      !n.toLowerCase.contains("dash") ==> Prop(
        TrelloTransforms.parseChecklistItem(n).amount.isEmpty)
    }

  property("title/desc fold preserves every word in order") =
    forAll(nameGen) { n =>
      val (title, desc) = TrelloTransforms.splitTitleDesc(n)
      val rebuilt = (title.stripSuffix("...") + " " + desc).split("\\s+")
        .filter(_.nonEmpty).toSeq
      rebuilt == n.split("\\s+").filter(_.nonEmpty).toSeq
    }

  property("title overflow always carries the ellipsis") =
    forAll(nameGen) { n =>
      val (title, desc) = TrelloTransforms.splitTitleDesc(n)
      desc.isEmpty || title.endsWith("...")
    }

  property("index prefix strip is stable on non-indexed names") =
    forAll(nameGen) { n =>
      !n.matches("^\\s*\\d+\\)\\s+.*") ==> Prop(
        TrelloTransforms.stripIndexPrefix(n) == n)
    }

  private val members: Gen[List[String]] = Gen.listOf(word).map(_.distinct)

  property("resolveOwners: owner and fallback are never the same person") =
    forAll(members, Gen.option(word), members) { (m, raw, board) =>
      val (o, f) = TrelloTransforms.resolveOwners(m, raw, board)
      o.isEmpty || f.isEmpty || o != f
    }

  property("resolveOwners: owner always comes from the card's members") =
    forAll(members, Gen.option(word), members) { (m, raw, board) =>
      val (o, _) = TrelloTransforms.resolveOwners(m, raw, board)
      o.forall(m.contains)
    }

  property("resolveOwners: without fallback text, owner is the first member") =
    forAll(members, members) { (m, board) =>
      TrelloTransforms.resolveOwners(m, None, board)._1 == m.headOption
    }
}
