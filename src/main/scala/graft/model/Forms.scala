package graft.model

/** Dynamic form → validated payload construction: the engine-side twin of
  * the reference's `Create.createFromViewModel` (`Forms.fs:78-188`).
  *
  * The reference builds typed F# objects from a UI view model by
  * REFLECTING over union cases and record fields at runtime. A
  * reflection walk has no Spark-side meaning (payloads here are
  * compact-union JSON documents, not .NET objects), so this module keeps
  * the reference's construction SEMANTICS — DU-case dispatch, record
  * field-map lookup, `TryCreate` scalar validation, option handling,
  * list fields, and the reference's exact error strings — but drives
  * them from an explicit per-type [[Forms.Schema]] instead of
  * `System.Type`, and produces the payload JSON the graph store persists
  * (same conventions as [[Payloads]]: fieldless union case → bare
  * string, single-field case → `{"Case":value}`, multi-field case →
  * `{"Case":[...]}`; record → declaration-ordered object with `None`
  * fields omitted).
  *
  * One DELIBERATE divergence, documented: the reference's record branch
  * (`Forms.fs:168-171`) errors on ANY missing field, yet its own test
  * (`tests/.../Forms.fs` "works with option types") omits the optional
  * `LabNumber` field and expects success with `None`. We side with the
  * test's intent: a missing OPTION-typed record field defaults to
  * `None`; a missing required field stays the reference's error.
  */
object Forms {

  // ----------------------------------------------- view model (Forms.fs:3-8)

  /** `SimpleValue` (`Types.fs`): the scalar leaves a form can carry. */
  sealed trait SimpleValue
  object SimpleValue {
    final case class Num(value: Double) extends SimpleValue
    final case class Txt(value: String) extends SimpleValue
    final case class Bool(value: Boolean) extends SimpleValue
    final case class DateV(iso: String) extends SimpleValue
    final case class TimeV(hms: String) extends SimpleValue
  }

  /** `NodeViewModel` (`Forms.fs:3-8`). */
  sealed trait Vm
  final case class Du(caseName: String, value: Vm) extends Vm
  final case class FieldMap(fields: Map[String, Vm]) extends Vm
  final case class Value(v: SimpleValue) extends Vm
  final case class VmList(items: Seq[(Int, Vm)]) extends Vm
  case object NotEnteredYet extends Vm

  // --------------------------------------- compact-union JSON result tree

  sealed trait Json { def render: String }
  /** Raw numeric text — rendered exactly as produced by the scalar
    * schema (double via `Double.toString`, matching [[Payloads]]'s
    * `num()` cast rendering; int without a decimal point).
    */
  final case class JNum(text: String) extends Json { def render: String = text }
  final case class JStr(s: String) extends Json {
    def render: String = "\"" + graft.model.Json.str(s) + "\""
  }
  final case class JBool(b: Boolean) extends Json { def render: String = b.toString }
  final case class JArr(items: Seq[Json]) extends Json {
    def render: String = items.map(_.render).mkString("[", ",", "]")
  }
  /** Object with declaration-ordered fields; `JNone` members are omitted
    * (FSharpLu convention, same as [[Payloads.encodeIndividualDate]]).
    */
  final case class JObj(fields: Seq[(String, Json)]) extends Json {
    def render: String = fields.filterNot(_._2 == JNone)
      .map { case (k, v) => "\"" + graft.model.Json.str(k) + "\":" + v.render }
      .mkString("{", ",", "}")
  }
  /** An absent optional value: omitted in records, `null` elsewhere. */
  case object JNone extends Json { def render: String = "null" }

  // ------------------------------------------------------------- schemas

  /** The reflection-free stand-in for `System.Type`: what
    * `createFromViewModel` learns about the target via
    * `FSharpType.GetUnionCases` / `GetRecordFields` / `TryCreate`
    * lookups, declared explicitly per type.
    */
  sealed trait Schema
  /** Union: cases in declaration order, each with named fields. */
  final case class DuSchema(typeName: String,
                            cases: Seq[(String, Seq[(String, Schema)])]) extends Schema
  /** Record: fields in declaration order (render order). */
  final case class RecordSchema(typeName: String,
                                fields: Seq[(String, Schema)]) extends Schema
  final case class OptionSchema(inner: Schema) extends Schema
  final case class ListSchema(inner: Schema) extends Schema
  /** Scalar leaf with a `TryCreate`-style validator (`Forms.fs:146-157`). */
  final case class ScalarSchema(typeName: String,
                                tryCreate: SimpleValue => Either[String, Json]) extends Schema

  private def sequence[A](xs: Seq[Either[String, A]]): Either[String, Seq[A]] =
    xs.foldRight(Right(Nil): Either[String, Seq[A]]) {
      case (e, acc) => for (v <- e; rest <- acc) yield v +: rest
    }

  /** Fieldless case → bare string; one field → `{"Case":v}`; several →
    * `{"Case":[...]}` (the reference serializer's tuple form, e.g.
    * `{"Site":[lat,lon]}` in the seeded context payloads).
    */
  private def encodeDuCase(name: String, args: Seq[Json]): Json = args match {
    case Seq()  => JStr(name)
    case Seq(a) => JObj(Seq(name -> a))
    case many   => JObj(Seq(name -> JArr(many)))
  }

  /** `processField` (`Forms.fs:53-71`): a field's sub-view-model routed
    * by shape, with the reference's error strings.
    */
  private def processField(vm: Vm, schema: Schema): Either[String, Json] = vm match {
    case NotEnteredYet => schema match {
      // divergence shared with the record branch: an absent option is None
      case _: OptionSchema => Right(JNone)
      case _               => Left("A value was missing")
    }
    case Value(_)    => createFromViewModel(schema, vm)
    case FieldMap(_) => createFromViewModel(schema, vm)
    case Du(c, _) => schema match {
      case _: DuSchema | _: OptionSchema => createFromViewModel(schema, vm)
      case _ =>
        val _ = c
        Left("The type is not a DU as specified in the view model")
    }
    case VmList(_) => createFromViewModel(schema, vm)
  }

  /** The reference's recursive constructor (`Forms.fs:78-188`), schema-
    * driven. Returns the validated payload JSON or the FIRST error in
    * declaration order (the reference's `Result.ofList` short-circuits
    * the same way).
    */
  def createFromViewModel(schema: Schema, vm: Vm): Either[String, Json] =
    (schema, vm) match {
      // ---- option: an F# DU with cases Some/None (Forms.fs handles it
      // through the generic union path; made explicit here)
      case (OptionSchema(inner), Du("Some", v)) => processField(v, inner)
      case (OptionSchema(_), Du("None", _))     => Right(JNone)
      case (OptionSchema(_), Du(c, _)) =>
        Left(s"The DU case $c does not exist on this type.")
      case (OptionSchema(_), NotEnteredYet) => Left("No data has been entered yet")
      case (OptionSchema(inner), other)     => processField(other, inner)

      // ---- union dispatch (Forms.fs:82-140)
      case (du: DuSchema, Du(case1, inner)) =>
        du.cases.find(_._1 == case1) match {
          case None =>
            Left(s"The DU case $case1 does not exist on this type.")
          case Some((_, caseFields)) =>
            val args: Either[String, Seq[Json]] = inner match {
              case NotEnteredYet =>
                if (caseFields.isEmpty) Right(Nil)
                else Left("No DU information selected.")
              case Du(_, _) =>
                if (caseFields.length == 1) caseFields.head._2 match {
                  case s @ (_: DuSchema | _: OptionSchema) =>
                    createFromViewModel(s, inner).map(Seq(_))
                  case _ => Left("A non-DU type was specified on a DU " +
                    "field, but only a DU view model was given")
                }
                else Left("A DU view model was specified for a DU, but " +
                  "the parent DU does not have a single field.")
              case Value(_) =>
                if (caseFields.length == 1)
                  createFromViewModel(caseFields.head._2, inner).map(Seq(_))
                else Left("Only a single value was given for a multi- " +
                  "or -zero field DU case.")
              case FieldMap(m) =>
                sequence(caseFields.map { case (fname, fschema) =>
                  m.get(fname) match {
                    case Some(fv) => processField(fv, fschema)
                    case None => Left(s"Value not found for DU field $fname")
                  }
                })
              case VmList(items) =>
                if (caseFields.length == 1) caseFields.head._2 match {
                  case ListSchema(el) =>
                    sequence(items.sortBy(_._1).map(i => processField(i._2, el)))
                      .map(l => Seq(JArr(l)))
                  case _ => Left("Not a list type")
                }
                else Left("A list was specified but the DU does not " +
                  "have only one list type field")
            }
            args.map(encodeDuCase(case1, _))
        }

      // ---- record from a field map (Forms.fs:166-180 + the documented
      // option-default divergence)
      case (rec: RecordSchema, FieldMap(m)) =>
        sequence(rec.fields.map { case (fname, fschema) =>
          m.get(fname) match {
            case Some(fv) => processField(fv, fschema).map(fname -> _)
            case None => fschema match {
              case _: OptionSchema => Right(fname -> JNone)
              case _ => Left(s"No data has been entered for: $fname")
            }
          }
        }).map(JObj(_))

      // ---- top-level list (Forms.fs:181-188)
      case (ListSchema(el), VmList(items)) =>
        sequence(items.sortBy(_._1).map(i => processField(i._2, el))).map(JArr(_))
      case (_: ListSchema, _) => Left("Not a list type")

      // ---- scalar leaf via TryCreate (Forms.fs:146-157)
      case (ScalarSchema(_, create), Value(v)) => create(v)

      case (_, NotEnteredYet) => Left("No data has been entered yet")
      case (_: DuSchema, _)   => Left("The type is not a DU as specified in the view model")
      case (_: RecordSchema, _) => Left("Not a list or a record type")
      case (_: ScalarSchema, _) => Left("Invalid type")
    }

  // -------------------------------------------- scalar schema library

  import SimpleValue._

  private def asDouble(v: SimpleValue): Either[String, Double] = v match {
    case Num(n) => Right(n)
    // the reference's TryCreate members parse Text to float (the forms
    // test enters latitude as Text "56")
    case Txt(s) => s.trim.toDoubleOption.toRight(s"Not a number: $s")
    case _      => Left("Invalid type")
  }

  private def renderDouble(d: Double): JNum = JNum(d.toString)

  /** `Text.ShortText.TryCreate`: non-empty, ≤ 100 chars. */
  val shortText: ScalarSchema = ScalarSchema("ShortText", {
    case Txt(s) => Fields.createShortText(s).map(t => JStr(t.value))
    case _      => Left("Invalid type")
  })

  /** `Text.Text.TryCreate`: non-empty free text. */
  val longText: ScalarSchema = ScalarSchema("Text", {
    case Txt(s) => Fields.createText(s).map(t => JStr(t.value))
    case _      => Left("Invalid type")
  })

  /** `Geography.Latitude.TryCreate` via [[Fields.createLatitude]]. */
  val latitude: ScalarSchema = ScalarSchema("Latitude",
    v => asDouble(v).flatMap(Fields.createLatitude).map(l => renderDouble(l.dd)))

  /** `Geography.Longitude.TryCreate` via [[Fields.createLongitude]]. */
  val longitude: ScalarSchema = ScalarSchema("Longitude",
    v => asDouble(v).flatMap(Fields.createLongitude).map(l => renderDouble(l.dd)))

  /** `StratigraphicSequence.createDepth` via [[Fields.createDepth]]. */
  val depth: ScalarSchema = ScalarSchema("Depth",
    v => asDouble(v).flatMap(Fields.createDepth).map(d => renderDouble(d.cm)))

  /** Raw float passthrough (unit-of-measure floats like `calYearBP`:
    * `Forms.fs:158-163` passes `Number` straight through).
    */
  val floatField: ScalarSchema = ScalarSchema("float", {
    case Num(n) => Right(renderDouble(n))
    case _      => Left("Invalid type")
  })

  /** Raw int passthrough (`Forms.fs:160`: `int n`). */
  val intField: ScalarSchema = ScalarSchema("int", {
    case Num(n) => Right(JNum(n.toInt.toString))
    case _      => Left("Invalid type")
  })

  /** Raw bool passthrough (`Forms.fs:163`). */
  val boolField: ScalarSchema = ScalarSchema("bool", {
    case Bool(b) => Right(JBool(b))
    case _       => Left("Invalid type")
  })

  // ----------------------------------- target-type schemas (reference)

  /** `Population.Taxonomy.TaxonNode` — the rank cases the reference
    * forms tests exercise plus the backbone ranks `HttpSources` routes
    * (`Population.fs` taxonomy module).
    */
  val taxonNode: DuSchema = DuSchema("TaxonNode", Seq(
    "Life" -> Nil,
    "Kingdom" -> Seq("name" -> shortText),
    "Phylum" -> Seq("name" -> shortText),
    "Class" -> Seq("name" -> shortText),
    "Order" -> Seq("name" -> shortText),
    "Family" -> Seq("name" -> shortText),
    "Genus" -> Seq("name" -> shortText),
    "Species" -> Seq("generic" -> shortText, "specific" -> shortText,
      "authorship" -> shortText),
    "Subspecies" -> Seq("generic" -> shortText, "specific" -> shortText,
      "subspecific" -> shortText, "authorship" -> shortText),
    "Variety" -> Seq("generic" -> shortText, "specific" -> shortText,
      "varietal" -> shortText, "authorship" -> shortText)))

  /** `Population.BioticProxies.MicrofossilGroup` (fieldless cases). */
  val microfossilGroup: DuSchema = DuSchema("MicrofossilGroup", Seq(
    "Pollen" -> Nil, "PlantMacrofossil" -> Nil, "Diatom" -> Nil,
    "Ostracod" -> Nil, "OtherMicrofossilGroup" -> Seq("group" -> shortText)))

  /** `Population.BioticProxies.Morphotype`. */
  val morphotype: DuSchema = DuSchema("Morphotype", Seq(
    "IndirectMorphotype" -> Seq("morphotypeName" -> shortText),
    "Microfossil" -> Seq("proxyGroup" -> microfossilGroup,
      "morphotypeName" -> shortText)))

  /** `Population.BioticProxies.BioticProxyNode`. */
  val bioticProxyNode: DuSchema = DuSchema("BioticProxyNode", Seq(
    "Morphotype" -> Seq("morphotype" -> morphotype),
    "ContemporaryWholeOrganism" -> Seq("taxon" -> shortText)))

  /** `Exposure.StudyTimeline.TemporalResolution` (fieldless forms). */
  val temporalResolution: DuSchema = DuSchema("TemporalResolution", Seq(
    "Regular" -> Seq("resolution" -> floatField),
    "Irregular" -> Nil))

  /** A hiatus between dated levels: `Hiatus of oldest * youngest`. */
  val hiatus: DuSchema = DuSchema("Hiatus", Seq(
    "Hiatus" -> Seq("oldest" -> floatField, "youngest" -> floatField)))

  /** `Exposure.StudyTimeline.IndividualTimelineNode`. */
  val individualTimelineNode: DuSchema = DuSchema("IndividualTimelineNode", Seq(
    "Continuous" -> Seq("resolution" -> temporalResolution),
    "Discontinuous" -> Seq("resolution" -> temporalResolution,
      "hiatuses" -> ListSchema(hiatus))))

  /** `StratigraphicSequence.DepthInCore` (the cases [[Payloads
    * .decodeDepth]] reads).
    */
  val depthInCore: DuSchema = DuSchema("DepthInCore", Seq(
    "DepthPoint" -> Seq("depth" -> depth),
    "DepthBand" -> Seq("lower" -> depth, "upper" -> depth),
    "DepthNotStated" -> Nil,
    "DepthQualitativeLevel" -> Seq("levelName" -> shortText)))

  /** `OldDate.MeasurementError` ([[Payloads.decodeMeasurementError]]). */
  val measurementError: DuSchema = DuSchema("MeasurementError", Seq(
    "NoDatingErrorSpecified" -> Nil,
    "DatingErrorPlusMinus" -> Seq("error" -> floatField),
    "DatingErrorPlusMinusSigma" -> Seq("sigma" -> intField, "error" -> floatField),
    "DatingErrorRangeSigma" -> Seq("sigma" -> intField,
      "lower" -> floatField, "upper" -> floatField)))

  /** `OldDate.UncalibratedDate` record (`{Date, UncalibratedDateError}`,
    * the shape [[Payloads.decodeCalibrated]] reads back).
    */
  val uncalibratedDate: RecordSchema = RecordSchema("UncalibratedDate", Seq(
    "Date" -> floatField,
    "UncalibratedDateError" -> measurementError))

  /** `OldDate.CalibratedRadiocarbonDate` record. */
  val calibratedRadiocarbonDate: RecordSchema = RecordSchema("CalibratedRadiocarbonDate", Seq(
    "CalibratedDate" -> floatField,
    "CalibrationCurve" -> shortText,
    "UncalibratedDate" -> OptionSchema(uncalibratedDate)))

  /** `OldDate.OldDatingMethod` — the calibrated case the forms test
    * uses plus the simple scalar cases ([[Payloads.decodeDatingMethod]]).
    */
  val oldDatingMethod: DuSchema = DuSchema("OldDatingMethod", Seq(
    "RadiocarbonUncalibrated" -> Seq("date" -> floatField),
    "RadiocarbonCalibrated" -> Seq("calibratedDate" -> calibratedRadiocarbonDate),
    "CollectionDate" -> Seq("year" -> floatField),
    "DepositionalZone" -> Seq("name" -> shortText)))

  /** `Exposure.StudyTimeline.IndividualDateNode` (`Exposure.fs:14-34`):
    * the record the reference's option-types forms test constructs; its
    * JSON round-trips through [[Payloads.decodeIndividualDate]].
    */
  val individualDateNode: RecordSchema = RecordSchema("IndividualDateNode", Seq(
    "Date" -> oldDatingMethod,
    "MeasurementError" -> measurementError,
    "MaterialDated" -> shortText,
    "SampleDepth" -> OptionSchema(depthInCore),
    "LabNumber" -> OptionSchema(shortText),
    "Discarded" -> boolField))

  /** `Geography.SamplingLocation` (`Types.fs:420-428`). */
  val samplingLocation: DuSchema = DuSchema("SamplingLocation", Seq(
    "Site" -> Seq("latitude" -> latitude, "longitude" -> longitude),
    "Area" -> Seq("polygon" -> shortText),
    "Locality" -> Seq("locality" -> shortText, "district" -> shortText,
      "region" -> shortText, "country" -> shortText),
    "District" -> Seq("district" -> shortText, "region" -> shortText,
      "country" -> shortText),
    "Region" -> Seq("region" -> shortText, "country" -> shortText),
    "Country" -> Seq("country" -> shortText),
    "Arctic" -> Nil))

  /** `Population.Context.SampleOrigin` (`Population.fs:165-171`). */
  val sampleOrigin: DuSchema = DuSchema("SampleOrigin", Seq(
    "LakeSediment" -> Seq("depths" -> depthInCoreExtent),
    "PeatCore" -> Seq("depths" -> depthInCoreExtent),
    "Excavation" -> Seq("depths" -> depthInCoreExtent),
    "Subfossil" -> Nil,
    "LivingOrganism" -> Nil,
    "OtherOrigin" -> Seq("origin" -> shortText,
      "depths" -> OptionSchema(depthInCoreExtent))))

  /** `StratigraphicSequence.DepthExtent`. */
  lazy val depthInCoreExtent: DuSchema = DuSchema("DepthExtent", Seq(
    "DepthRange" -> Seq("lower" -> depth, "upper" -> depth),
    "DepthRangeNotStated" -> Nil))

  /** `Population.Context.ContextNode` (`Population.fs:154-163`): the
    * record the g48 gate query constructs per input row.
    */
  val contextNode: RecordSchema = RecordSchema("ContextNode", Seq(
    "Name" -> shortText,
    "SamplingLocation" -> samplingLocation,
    "SampleOrigin" -> sampleOrigin,
    "SampleLocationDescription" -> OptionSchema(longText)))
}
