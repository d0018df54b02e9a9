package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flatten nested structs into `parent__child` top-level columns and back.
  *
  * Reference: moisturizer/schemas.py:37-43 (flatten_json with `__` separator;
  * inverse unflatten) and utils.py:5-34. The reference drops null-valued keys
  * per row (a dict has no fixed columns); in columnar Spark the equivalence
  * is "NULL cell == absent key" (SURVEY §7.5 item 5) — the serving-direction
  * `to_json` drops nulls to restore exact reference output shape.
  *
  * Pure projection generation — no UDFs, stays inside whole-stage codegen.
  */
object Flattener {
  val Sep = "__"

  /** Columns that project `schema` fully flattened: struct fields expand
    * recursively to `a__b__c` aliases; leaf fields pass through. */
  def flattenColumns(schema: StructType): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => flattenStruct(col(quoted(f.name)), s, f.name)
        case _             => Seq(col(quoted(f.name)))
      }
    }

  private def quoted(n: String) = s"`$n`"

  private def flattenStruct(parent: Column, s: StructType, prefix: String): Seq[Column] =
    s.fields.toSeq.flatMap { f =>
      val child = parent.getField(f.name)
      f.dataType match {
        case cs: StructType => flattenStruct(child, cs, prefix + Sep + f.name)
        case _              => Seq(child.as(prefix + Sep + f.name))
      }
    }

  /** df with every struct column recursively flattened to `__`-joined leaf
    * columns; non-struct columns unchanged, field order preserved. */
  def flatten(df: DataFrame): DataFrame =
    df.select(flattenColumns(df.schema): _*)

  /** Flattened StructType (schema-level mirror of [[flatten]]). */
  def flattenSchema(schema: StructType, prefix: String = ""): StructType =
    StructType(schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => flattenSchema(s, prefix + f.name + Sep).fields.toSeq
        case _             => Seq(f.copy(name = prefix + f.name))
      }
    })

  /** Inverse: group `a__b` columns back into `struct(...) AS a`
    * (serving direction, reference schemas.py:42-43, utils.py:19-34). */
  def unflatten(df: DataFrame): DataFrame = {
    val cols = unflattenColumns(df.schema.fieldNames.toSeq)
    df.select(cols: _*)
  }

  /** A head that is BOTH a scalar column (`a`) and a nested group (`a__b`) —
    * reachable through add-only evolution (ingest {"a":1} then {"a":{"b":2}})
    * — merges per row exactly like the reference's per-row dicts: the scalar
    * wins when present, else the nested object. The merged column is a
    * VARIANT (either shape per row); `to_json` renders it natively. */
  private def scalarObjectMerge(scalar: Column, nested: Column): Column =
    when(scalar.isNotNull, scalar.cast(VariantType))
      .otherwise(to_variant_object(nested))

  private def unflattenColumns(names: Seq[String]): Seq[Column] = {
    // group by head segment, preserving first-appearance order
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    names.foreach { n =>
      val head = n.split(Sep, 2)(0)
      groups(head) = groups.getOrElse(head, Vector.empty) :+ n
    }
    groups.toSeq.map { case (head, members) =>
      if (members == Vector(head)) col(quoted(head))
      else {
        // nested: strip the head prefix and recurse; a member equal to the
        // head itself is the scalar sibling, merged per row
        val (self, rest) = members.partition(_ == head)
        val inner = rest.map { m =>
          m.substring(head.length + Sep.length) -> col(quoted(m))
        }
        val nested = structOf(inner)
        if (self.isEmpty) nested.as(head)
        else scalarObjectMerge(col(quoted(head)), nested).as(head)
      }
    }
  }

  private def structOf(fields: Seq[(String, Column)]): Column = {
    val groups = scala.collection.mutable.LinkedHashMap.empty[String, Vector[(String, Column)]]
    fields.foreach { case (n, c) =>
      val head = n.split(Sep, 2)(0)
      groups(head) = groups.getOrElse(head, Vector.empty) :+ (n -> c)
    }
    val cols = groups.toSeq.map { case (head, members) =>
      members match {
        case Vector((n, c)) if n == head => c.as(head)
        case _ =>
          val (self, rest) = members.partition(_._1 == head)
          val nested = structOf(rest.map { case (n, c) =>
            n.substring(head.length + Sep.length) -> c
          })
          if (self.isEmpty) nested.as(head)
          else scalarObjectMerge(self.head._2, nested).as(head)
      }
    }
    // restore null structs: a struct whose every leaf is null was an absent
    // object before flattening ("null cell == absent key", SURVEY §7.5.5)
    val anyLeaf = fields.map(_._2.isNotNull).reduce(_ || _)
    when(anyLeaf, struct(cols: _*))
  }
}
