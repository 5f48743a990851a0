package graft.weblog

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.functions.ValidateWebLog

/** Property tests (SURVEY.md §5.2): generator payloads always validate;
  * corruption always invalidates; the strict-timestamp check agrees with
  * a reference reimplementation on arbitrary inputs. (ScalaCheck Gens
  * sampled with a fixed seed — no scalatestplus bridge in the offline
  * cache.)
  */
class PropertySpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val hour = LocalDateTime.of(2024, 5, 1, 12, 0)
  private def check(p: String, dialect: String): Boolean = {
    val e = ValidateWebLog(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(p)), dialect)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getBoolean(0)
  }

  test("every generated payload is valid, in both dialects") {
    forAll(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 1000L))) { case (i, seed) =>
      assert(check(Generator.payload(seed, i, hour, "B"), "B"))
      assert(check(Generator.payload(seed, i, hour, "A"), "A"))
    }
  }

  test("every corruption mode invalidates a valid payload") {
    forAll(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0, 2))) { case (i, mode) =>
      val p = Generator.payload(7, i, hour, "B")
      assert(!check(Generator.corrupt(p, mode), "B"))
    }
  }

  test("strict timestamp check agrees with a strptime reference model") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("u-M-d'T'H:m:s'Z'")
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    def reference(s: String): Boolean =
      s.matches("""\d{4}-\d{1,2}-\d{1,2}T\d{1,2}:\d{1,2}:\d{1,2}Z""") &&
        (try { java.time.LocalDateTime.parse(s, fmt); true }
         catch { case _: Exception => false })

    val tsGen = for {
      y <- Gen.chooseNum(1900, 2100); mo <- Gen.chooseNum(0, 13)
      d <- Gen.chooseNum(0, 32); h <- Gen.chooseNum(0, 25)
      mi <- Gen.chooseNum(0, 61); se <- Gen.chooseNum(0, 61)
      sep <- Gen.oneOf("T", " ", "t")
      z <- Gen.oneOf("Z", "", "z")
    } yield s"$y-$mo-${d}$sep$h:$mi:${se}$z"

    forAll(tsGen) { s =>
      assert(ValidateWebLog.strictTimestampOk(s) == reference(s), s"input: $s")
    }
  }

  test("upsert/delete sequences agree with a last-write-wins reference model") {
    // model-based check of the snapshot-commit merge path: random
    // operation sequences (keyed upserts with colliding keys and replayed
    // sequence numbers, predicate deletes) against a driver-side Map fold
    // with MERGE semantics — stored row survives iff its seq is strictly
    // greater than an incoming write's (ties: incoming wins).
    import spark.implicits._
    type Key = (String, String)
    val keys: Vector[Key] = (for {
      u <- 0 until 12; t <- 0 until 3
    } yield (s"u$u", f"2024-05-01T12:0$t%d:00Z")).toVector

    val batchGen: Gen[Map[Key, (String, Long)]] = for {
      n <- Gen.chooseNum(1, 10)
      ks <- Gen.pick(n, keys)
      hosts <- Gen.listOfN(n, Gen.oneOf("a.example", "b.example", "c.example"))
      seqs <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    } yield ks.zip(hosts.zip(seqs)).toMap
    val opGen: Gen[Either[Map[Key, (String, Long)], Set[String]]] =
      Gen.frequency(
        3 -> batchGen.map(Left(_)),
        1 -> Gen.someOf((0 until 12).map(u => s"u$u")).map(s => Right(s.toSet)))

    forAll(Gen.listOfN(5, opGen), n = 3) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("ice-prop").toString
      val table = IcebergLikeTable(spark, s"$dir/t", "event",
        uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
      var model = Map.empty[Key, (String, Long)]
      ops.foreach {
        case Left(batch) =>
          val df = batch.toSeq.map { case ((u, ts), (h, q)) =>
            (u, ts, if (u.hashCode % 2 == 0) "view" else "click", h, q)
          }.toDF("user_id", "timestamp", "event", "hostname", "seq")
          table.write(df, "seq")
          model = batch.foldLeft(model) { case (m, (k, (h, q))) =>
            m.get(k) match {
              case Some((_, storedQ)) if storedQ > q => m
              case _ => m.updated(k, (h, q))
            }
          }
        case Right(users) =>
          table.delete($"user_id".isin(users.toSeq: _*))
          model = model.filterNot { case ((u, _), _) => users.contains(u) }
      }
      val got =
        if (model.isEmpty) Map.empty[Key, (String, Long)]
        else table.read.select("user_id", "timestamp", "hostname", "seq")
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getString(2), r.getLong(3))).toMap
      assert(got == model,
        s"diverged: extra=${got.toSet -- model.toSet} missing=${model.toSet -- got.toSet}")
    }
  }

  test("merge sequences (upserts + tombstones + deletes) agree with the reference model") {
    // model-based check of the ONE-COMMIT MERGE path: random op
    // sequences mixing plain upserts, merges that carry tombstones, and
    // predicate deletes, against a driver-side fold with the documented
    // semantics — incoming-batch winner per key is max seq with ties
    // preferring the tombstone; against stored rows the incoming winner
    // survives iff its seq >= stored (ties: incoming); a winning
    // tombstone removes the key.
    import spark.implicits._
    type Key = (String, String)
    sealed trait Op
    case class Up(b: Map[Key, (String, Long)]) extends Op
    case class Del(users: Set[String]) extends Op
    case class Mg(up: Map[Key, (String, Long)], del: Map[Key, Long]) extends Op

    val keys: Vector[Key] = (for {
      u <- 0 until 10; t <- 0 until 3
    } yield (s"u$u", f"2024-05-01T12:0$t%d:00Z")).toVector
    def eventOf(u: String): String = if (u.hashCode % 2 == 0) "view" else "click"

    val batchGen: Gen[Map[Key, (String, Long)]] = for {
      n <- Gen.chooseNum(1, 8)
      ks <- Gen.pick(n, keys)
      hosts <- Gen.listOfN(n, Gen.oneOf("a.example", "b.example"))
      seqs <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
    } yield ks.zip(hosts.zip(seqs)).toMap
    val mergeGen: Gen[Mg] = for {
      up <- batchGen
      nd <- Gen.chooseNum(1, 6)
      dk <- Gen.pick(nd, keys)
      dq <- Gen.listOfN(nd, Gen.chooseNum(1L, 4L))
    } yield Mg(up, dk.zip(dq).toMap)
    val opGen: Gen[Op] = Gen.frequency(
      2 -> batchGen.map(Up(_)),
      3 -> mergeGen,
      1 -> Gen.someOf((0 until 10).map(u => s"u$u")).map(s => Del(s.toSet)))

    def upFold(model: Map[Key, (String, Long)],
        batch: Map[Key, (String, Long)]): Map[Key, (String, Long)] =
      batch.foldLeft(model) { case (m, (k, (h, q))) =>
        m.get(k) match {
          case Some((_, storedQ)) if storedQ > q => m
          case _ => m.updated(k, (h, q))
        }
      }

    forAll(Gen.listOfN(5, opGen), n = 3) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("ice-mprop").toString
      val table = IcebergLikeTable(spark, s"$dir/t", "event",
        uniqueKeys = Seq("user_id", "timestamp"), numBuckets = 4)
      var model = Map.empty[Key, (String, Long)]
      def upDf(b: Map[Key, (String, Long)]) = b.toSeq.map { case ((u, ts), (h, q)) =>
        (u, ts, eventOf(u), h, q)
      }.toDF("user_id", "timestamp", "event", "hostname", "seq")
      ops.foreach {
        case Up(b) =>
          table.write(upDf(b), "seq")
          model = upFold(model, b)
        case Del(users) =>
          table.delete($"user_id".isin(users.toSeq: _*))
          model = model.filterNot { case ((u, _), _) => users.contains(u) }
        case Mg(up, del) =>
          val tombs = del.toSeq.map { case ((u, ts), q) => (u, ts, eventOf(u), q) }
            .toDF("user_id", "timestamp", "event", "seq")
          table.merge(upDf(up), tombs, "seq")
          // incoming winner per key, ties prefer the tombstone
          (up.keySet ++ del.keySet).foreach { k =>
            val winner: (Option[(String, Long)], Long) = (up.get(k), del.get(k)) match {
              case (Some((h, q)), Some(dq)) =>
                if (dq >= q) (None, dq) else (Some((h, q)), q)
              case (Some((h, q)), None) => (Some((h, q)), q)
              case (None, Some(dq)) => (None, dq)
              case (None, None) => throw new IllegalStateException
            }
            val storedQ = model.get(k).map(_._2)
            if (!storedQ.exists(_ > winner._2)) {
              winner._1 match {
                case Some((h, q)) => model = model.updated(k, (h, q))
                case None => model = model.removed(k)
              }
            }
          }
      }
      val got =
        if (model.isEmpty && table.currentVersion.isEmpty)
          Map.empty[Key, (String, Long)]
        else table.read.select("user_id", "timestamp", "hostname", "seq")
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (r.getString(2), r.getLong(3))).toMap
      assert(got == model,
        s"diverged: extra=${got.toSet -- model.toSet} missing=${model.toSet -- got.toSet}")
    }
  }

  test("mergeInto clause algebra agrees with a row-by-row reference model") {
    // model-based check of the generic SQL MERGE path: random clause
    // stacks (conditional updates/deletes, inserts, BY SOURCE actions)
    // over random target/source tables, against a driver-side fold of
    // the documented semantics — first satisfied clause wins, NULL
    // conditions don't match, unmatched rows carry, unmatched-by-any-
    // insert source rows drop.
    import spark.implicits._
    import IcebergLikeTable.{MergeDelete, MergeInsert, MergeUpdate, MergeWhen}
    import org.apache.spark.sql.functions.{col, lit}

    // conds: 0 = none, 1 = s.v % 2 = 0, 2 = t.v >= 20
    final case class Cl(isDelete: Boolean, cond: Int)
    val clGen: Gen[Cl] = for {
      d <- Gen.oneOf(false, true); c <- Gen.chooseNum(0, 2)
    } yield Cl(d, c)
    val scenarioGen = for {
      nT <- Gen.chooseNum(5, 16)
      tVals <- Gen.listOfN(nT, Gen.chooseNum(0L, 40L))
      nS <- Gen.chooseNum(1, 12)
      sIds <- Gen.pick(nS, 0 until 30)
      sVals <- Gen.listOfN(nS, Gen.chooseNum(0L, 40L))
      matched <- Gen.listOfN(2, clGen).map(_.take(2))
      nM <- Gen.chooseNum(0, 2)
      withInsert <- Gen.oneOf(true, false)
      insCond <- Gen.chooseNum(0, 1) // none / s.v even
      withBySource <- Gen.oneOf(true, false)
      bySrc <- clGen
    } yield (tVals, sIds.toSeq.zip(sVals), matched.take(nM), withInsert,
      insCond, withBySource, bySrc)

    def condCol(c: Int): Option[org.apache.spark.sql.Column] = c match {
      case 0 => None
      case 1 => Some(col("s.v") % 2 === 0)
      case 2 => Some(col("t.v") >= 20L)
    }
    def condHolds(c: Int, sv: Option[Long], tv: Long): Boolean = c match {
      case 0 => true
      case 1 => sv.exists(_ % 2 == 0) // NULL s.v → doesn't match
      case 2 => tv >= 20L
    }

    forAll(scenarioGen, n = 6) {
      case (tVals, sRows, matchedCls, withInsert, insCond, withBySource, bySrcCl) =>
        val dir = java.nio.file.Files.createTempDirectory("mi-prop").toString
        val t = IcebergLikeTable(spark, s"$dir/t", "event")
        val target = tVals.zipWithIndex.map { case (v, i) =>
          (i.toLong, if (i % 2 == 0) "view" else "click", v)
        }
        t.append(target.toDF("id", "event", "v").repartition(3))
        val source = sRows.map { case (i, v) => (i.toLong, v) }
        val matched: Seq[MergeWhen] = matchedCls.map(c =>
          if (c.isDelete) MergeDelete(condCol(c.cond))
          else MergeUpdate(condCol(c.cond), Seq("v" -> col("s.v"))))
        val notMatched =
          if (!withInsert) Nil
          else Seq(MergeInsert(condCol(insCond), Seq(
            "id" -> col("s.id"), "event" -> lit("ins"), "v" -> col("s.v"))))
        val bySource: Seq[MergeWhen] =
          if (!withBySource) Nil
          else Seq(
            if (bySrcCl.isDelete) MergeDelete(condCol(bySrcCl.cond))
            else MergeUpdate(condCol(bySrcCl.cond), Seq("v" -> (col("t.v") + 100L))))
        if (matched.isEmpty && notMatched.isEmpty && bySource.isEmpty) ()
        else {
          val r = t.mergeInto(source.toDF("id", "v"),
            on = col("t.id") === col("s.id"),
            matched = matched, notMatched = notMatched,
            notMatchedBySource = bySource)

          // reference fold
          val srcByKey = source.toMap
          var expect = Map.empty[Long, (String, Long)]
          var (mu, md, mi) = (0L, 0L, 0L)
          target.foreach { case (id, ev, v) =>
            srcByKey.get(id) match {
              case Some(sv) =>
                matched.zip(matchedCls).find { case (_, c) =>
                  condHolds(c.cond, Some(sv), v) } match {
                  case Some((_: MergeDelete, _)) => md += 1
                  case Some((_: MergeUpdate, _)) =>
                    mu += 1; expect += id -> (ev, sv)
                  case None => expect += id -> (ev, v)
                }
              case None =>
                (bySource.headOption, Some(bySrcCl)) match {
                  case (Some(cl), Some(c)) if condHolds(c.cond, None, v) =>
                    cl match {
                      case _: MergeDelete => md += 1
                      case _: MergeUpdate => mu += 1; expect += id -> (ev, v + 100L)
                    }
                  case _ => expect += id -> (ev, v)
                }
            }
          }
          source.foreach { case (id, sv) =>
            if (!target.exists(_._1 == id)) {
              if (withInsert && condHolds(insCond, Some(sv), 0L)) {
                mi += 1; expect += id -> ("ins", sv)
              }
            }
          }
          val got = t.read.collect()
            .map(row => row.getAs[Long]("id") ->
              (row.getAs[String]("event"), row.getAs[Long]("v"))).toMap
          assert(got == expect,
            s"diverged: extra=${got.toSet -- expect.toSet} " +
              s"missing=${expect.toSet -- got.toSet} " +
              s"(matched=$matchedCls ins=$withInsert/$insCond by=$withBySource/$bySrcCl)")
          assert((r.updated, r.deleted, r.inserted) == ((mu, md, mi)),
            s"stats diverged: got $r expected ($mu,$md,$mi)")
        }
    }
  }

  test("overwrite-family sequences agree with a partition-map reference model") {
    // model-based check of the r9 overwrite family: random sequences of
    // append / dynamic-partition-overwrite / replaceWhere / full
    // overwrite over a day-partitioned key-less table, against a
    // driver-side multiset fold of the documented semantics — dynamic
    // overwrite replaces exactly the days the batch writes, replaceWhere
    // replaces exactly the predicate's region and reports the removed
    // count, appends accumulate, full overwrite resets.
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    sealed trait Op
    final case class App(rows: List[(Long, Int)]) extends Op
    final case class DynOv(rows: List[(Long, Int)]) extends Op
    final case class Repl(day: Int, ids: List[Long]) extends Op
    final case class FullOv(rows: List[(Long, Int)]) extends Op

    val rowsGen = for {
      n <- Gen.chooseNum(0, 6)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 999L); day <- Gen.chooseNum(1, 3)
      } yield (id, day))
    } yield rows
    val opGen: Gen[Op] = Gen.frequency(
      3 -> rowsGen.map(App.apply),
      2 -> rowsGen.map(DynOv.apply),
      2 -> (for { d <- Gen.chooseNum(1, 3); r <- rowsGen }
        yield Repl(d, r.map(_._1))),
      1 -> rowsGen.map(FullOv.apply))
    val seqGen = Gen.listOfN(5, opGen)

    forAll(seqGen, n = 5) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("ovw-prop").toString
      val t = IcebergLikeTable(spark, s"$dir/t", "day")
      var model = Vector.empty[(Long, Int)]
      def df(rows: Seq[(Long, Int)]) = rows.toDF("id", "day")
      ops.foreach {
        case App(rows) =>
          t.append(df(rows)); model = model ++ rows
        case DynOv(rows) =>
          t.overwritePartitions(df(rows))
          val days = rows.map(_._2).toSet
          model = model.filterNot(r => days(r._2)) ++ rows
        case Repl(day, ids) =>
          val rows = ids.map(id => (id, day))
          val removed = t.replaceWhere(col("day") === day, df(rows))
          assert(removed == model.count(_._2 == day),
            s"replaceWhere removed $removed, model had " +
              s"${model.count(_._2 == day)} rows in day=$day (ops=$ops)")
          model = model.filterNot(_._2 == day) ++ rows
        case FullOv(rows) =>
          t.overwrite(df(rows)); model = rows.toVector
      }
      val got =
        if (t.exists && t.currentVersion.isDefined)
          t.read.collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("day")))
            .toSeq.sorted
        else Seq.empty
      assert(got == model.sorted,
        s"diverged after $ops: got=$got expected=${model.sorted}")
    }
  }

  test("valid records round-trip through parse unchanged (multiset property)") {
    val df = Generator.frame(spark, 400, seed = 13, hour, invalidEvery = 8)
    val (ok, _) = Validator.route(Validator.validate(df, "payload", "B"))
    val parsed = Validator.parsed(ok, "payload", "B")
    // re-serialize the parsed fields; every payload must equal its source
    import org.apache.spark.sql.functions._
    val bad = parsed.filter(
      get_json_object(col("payload"), "$.user_id") =!= col("user_id") ||
        get_json_object(col("payload"), "$.timestamp") =!= col("timestamp") ||
        get_json_object(col("payload"), "$.event") =!= col("event"))
    assert(bad.count() == 0)
  }
}
