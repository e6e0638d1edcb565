package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Guard for the hand-maintained `owners` lists behind
  * [[IndexCatalog.ensure]]'s per-builder code fingerprints (round-8
  * advice): owner-scoped invalidation is only as sound as the lists, and
  * the one failure mode the old repo-global CRC could not have is a
  * refactor that moves builder logic into a graft class NOT named in
  * `owners` — edits to it would then silently adopt stale artifacts.
  *
  * This suite closes that gap structurally, without running Spark: it
  * parses every `IndexCatalog.ensure(...) { dir => ... }` call site in
  * `src/main`, resolves the `owners = ...` argument (inline `Seq(...)`
  * or a named val, following `:+`/`++` chains), extracts every
  * graft-package type referenced inside the BUILDER BLOCK (same-package
  * simple names resolved against a scan of all top-level graft
  * declarations, plus imported and fully-qualified references), and
  * asserts each is covered by some owner's class-file prefix — the same
  * prefix semantics `IndexCatalog.scopedFingerprint` applies.
  *
  * A new graft helper referenced from a builder therefore fails THIS
  * suite at the next test run instead of failing silently at the next
  * deploy. False positives (a reference that genuinely cannot change
  * the artifact bytes) go in `exempt` below with a justification.
  */
class OwnersGuardSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala")

  /** Classes referenced at ensure sites whose behavior cannot change the
    * artifact BYTES, so they are deliberately not owners:
    *  - IndexCatalog: the lifecycle machinery itself — it computes keys,
    *    manifests and fingerprints but never the artifact contents; a
    *    format change is versioned by its own manifest compatibility;
    *  - GraftBridge: the pure Column ⇄ Expression converter — no data
    *    semantics, just Spark-4 visibility plumbing;
    *  - SparkSpec/test helpers never appear in main sources. */
  private val exempt = Set("graft.sources.IndexCatalog",
    "org.apache.spark.sql.GraftBridge")

  private def readAll(p: Path): String =
    new String(Files.readAllBytes(p), "UTF-8")

  private lazy val sourceFiles: Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  /** name -> fully-qualified candidates, from top-level (column-0 or
    * modifier-prefixed) type declarations across the graft tree. */
  private lazy val universe: Map[String, Set[String]] = {
    val decl = """^(?:private\s+|final\s+|sealed\s+|abstract\s+|case\s+|(?:private\[\w+\]\s+))*(?:object|class|trait)\s+([A-Za-z0-9_]+)""".r
    val pkgRe = """(?m)^package\s+([\w.]+)""".r
    sourceFiles.flatMap { p =>
      val text = readAll(p)
      val pkg = pkgRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
      text.linesIterator.collect {
        case l if decl.findPrefixOf(l).isDefined =>
          val name = decl.findFirstMatchIn(l).get.group(1)
          name -> s"$pkg.$name"
      }
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  /** Index just past the matching close of the paren/brace at `open`. */
  private def matchDelim(text: String, open: Int): Int = {
    val (o, c) = text(open) match {
      case '(' => ('(', ')'); case '{' => ('{', '}')
      case ch => fail(s"not a delimiter: $ch")
    }
    var depth = 0; var i = open
    while (i < text.length) {
      val ch = text(i)
      if (ch == o) depth += 1
      else if (ch == c) { depth -= 1; if (depth == 0) return i + 1 }
      i += 1
    }
    fail(s"unbalanced $o at $open")
  }

  /** Strip line/block comments and string literals (incl. triple-quoted
    * and interpolated) so type names inside docs/SQL don't count. */
  private def stripNoise(text: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      if (text.startsWith("//", i)) { while (i < text.length && text(i) != '\n') i += 1 }
      else if (text.startsWith("/*", i)) {
        val e = text.indexOf("*/", i + 2); i = if (e < 0) text.length else e + 2
      } else if (text.startsWith("\"\"\"", i)) {
        val e = text.indexOf("\"\"\"", i + 3); i = if (e < 0) text.length else e + 3
      } else if (text(i) == '"') {
        i += 1
        while (i < text.length && text(i) != '"') { if (text(i) == '\\') i += 1; i += 1 }
        i += 1
      } else { sb += text(i); i += 1 }
    }
    sb.toString
  }

  /** RHS of `val <name> = ...`: from `=` append lines until balanced. */
  private def valRhs(fileText: String, name: String): Option[String] = {
    val re = ("""(?m)^[ \t]*(?:private(?:\[\w+\])?\s+)?(?:lazy\s+)?val\s+""" +
      java.util.regex.Pattern.quote(name) + """\b[^=]*=""").r
    re.findFirstMatchIn(fileText).map { m =>
      val lines = fileText.substring(m.end).linesIterator
      val sb = new StringBuilder
      var balance = 0
      var done = false
      while (!done && lines.hasNext) {
        val l = lines.next()
        sb.append(l).append('\n')
        balance += l.count(c => c == '(' || c == '[') - l.count(c => c == ')' || c == ']')
        if (balance <= 0 && l.trim.nonEmpty && !l.trim.endsWith(",") &&
            !l.trim.endsWith(":+") && !l.trim.endsWith("++")) done = true
      }
      sb.toString
    }
  }

  /** Builder logic routinely lives in same-file private helpers the
    * block calls by lowercase name (e.g. lshPairs → signature helpers →
    * `graft.plans.MinHashes`); expand the block with the bodies of every
    * same-file def/val it calls, to a fixpoint, so indirect class
    * references still reach the coverage check. */
  private def expandWithHelpers(fileText: String, block: String): String = {
    val callRe = """(?<![.\w])([a-z][A-Za-z0-9_]*)\s*\(""".r
    def calls(t: String): Set[String] =
      callRe.findAllMatchIn(t).map(_.group(1)).toSet
    // body of the def starting at `start`: skip the (balanced) signature
    // to its standalone `=`, then append lines until delimiters balance
    def defBodyFrom(start: Int): String = {
      var i = start; var depth = 0; var eq = -1
      while (eq < 0 && i < fileText.length - 1) {
        fileText(i) match {
          case '(' | '[' => depth += 1
          case ')' | ']' => depth -= 1
          case '=' if depth == 0 &&
              fileText(i + 1) != '=' && fileText(i + 1) != '>' &&
              fileText(i - 1) != '=' && fileText(i - 1) != '!' &&
              fileText(i - 1) != '<' && fileText(i - 1) != '>' => eq = i
          case '\n' if fileText.startsWith("\n", i) &&
              i + 1 < fileText.length && depth == 0 &&
              """(?m)^\s*(?:private|def|val|object|}|/\*\*)""".r
                .findPrefixOf(fileText.substring(i + 1)).isDefined &&
              !fileText.substring(start, i).contains("=") => // abstract/no-body def
            return ""
          case _ =>
        }
        i += 1
      }
      if (eq < 0) return ""
      val lines = fileText.substring(eq + 1).linesIterator
      val sb = new StringBuilder
      var balance = 0; var done = false
      while (!done && lines.hasNext) {
        val l = lines.next()
        sb.append(l).append('\n')
        balance += l.count(c => c == '(' || c == '{') -
                   l.count(c => c == ')' || c == '}')
        if (balance <= 0 && l.trim.nonEmpty && !l.trim.endsWith(",") &&
            !l.trim.endsWith("=") && !l.trim.endsWith("=>") &&
            !l.trim.endsWith("+") && !l.trim.endsWith("&&")) done = true
      }
      sb.toString
    }
    var included = Set.empty[String]
    var text = block
    var frontier = calls(block)
    while (frontier.nonEmpty) {
      val name = frontier.head
      frontier -= name
      if (!included(name)) {
        included += name
        val defRe = ("""(?m)^[ \t]*(?:private(?:\[\w+\])?\s+)?def\s+""" +
          java.util.regex.Pattern.quote(name) + """\b""").r
        // ALL overloads: delegation chains like f(x) -> f(x, default)
        // put the interesting references in a sibling overload's body
        for (m <- defRe.findAllMatchIn(fileText)) {
          val body = stripNoise(defBodyFrom(m.start))
          text += "\n" + body
          frontier ++= calls(body) -- included
        }
      }
    }
    text
  }

  /** Owner class tokens (`X.getClass`, `classOf[X]`) out of an owners
    * expression, following named `<id>Owners` vals recursively. */
  private def ownerClasses(fileText: String, expr: String,
                           seen: Set[String] = Set.empty): Set[String] = {
    val getCls = """([A-Za-z0-9_.]+)\.getClass""".r
    val clsOf = """classOf\[([A-Za-z0-9_.]+)\]""".r
    val direct = (getCls.findAllMatchIn(expr) ++ clsOf.findAllMatchIn(expr))
      .map(_.group(1)).toSet
    val refs = """\b([a-zA-Z0-9_]*Owners)\b""".r.findAllMatchIn(expr)
      .map(_.group(1)).toSet -- seen
    direct ++ refs.flatMap(r =>
      valRhs(fileText, r).toSet[String]
        .flatMap(rhs => ownerClasses(fileText, rhs, seen ++ refs + r)))
  }

  private def resolve(token: String, pkg: String,
                      imports: Map[String, String]): Option[String] = {
    if (token.startsWith("graft.")) Some(token)
    else {
      val simple = token.takeWhile(_ != '.') // e.g. IvfIndex.assignments
      imports.get(simple).orElse {
        universe.get(simple).flatMap { cands =>
          cands.find(_ == s"$pkg.$simple").orElse(cands.headOption)
        }
      }
    }
  }

  private def covered(ref: String, owners: Set[String]): Boolean =
    exempt.contains(ref) || owners.exists(o => ref == o || ref.startsWith(o))

  /** Member `def`/`val` names declared in each top-level graft OBJECT's
    * defining file (file-scoped approximation: every member name in the
    * file maps to every top-level object in it — over-approximate, so
    * the failure mode is a loud false positive, never a silent miss).
    * Resolves the round-12 blind spot: `tokens`/`wordShingles` arrive in
    * builder blocks as BARE lowercase names via
    * `import graft.functions.TextFunctions._`, which the class-token
    * scan below cannot see. */
  private lazy val objectMembers: Map[String, (Path, Set[String])] = {
    val memberRe = """(?m)^\s{2,}(?:private(?:\[\w+\])?\s+|final\s+|lazy\s+)*(?:def|val)\s+([A-Za-z_][A-Za-z0-9_]*)""".r
    val objRe = """(?m)^(?:private\s+|case\s+)*object\s+([A-Za-z0-9_]+)""".r
    val pkgRe = """(?m)^package\s+([\w.]+)""".r
    sourceFiles.flatMap { p =>
      val text = stripNoise(readAll(p))
      val pkg = pkgRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
      val members = memberRe.findAllMatchIn(text).map(_.group(1)).toSet
      objRe.findAllMatchIn(text).map(m => s"$pkg.${m.group(1)}" -> (p, members))
    }.toMap
  }

  private val importRe = """(?m)^\s*import\s+(graft[\w.]*)\.(\{[^}]*\}|[\w]+)""".r
  private val wildcardRe = """(?m)^\s*import\s+(graft[\w.]+)\._\s*$""".r
  private val pkgRe = """(?m)^package\s+([\w.]+)""".r

  private def importsOf(text: String): Map[String, String] =
    importRe.findAllMatchIn(text).flatMap { m =>
      val prefix = m.group(1)
      val what = m.group(2)
      if (what.startsWith("{"))
        what.stripPrefix("{").stripSuffix("}").split(",").toSeq
          .map(_.trim.split("=>").head.trim).filter(_.nonEmpty)
          .map(n => n -> s"$prefix.$n")
      else Seq(what -> s"$prefix.$what")
    }.toMap

  /** graft types referenced in `block` (fully-qualified or capitalized
    * simple names resolved against `pkg`/`imports`). */
  private def graftRefs(block: String, pkg: String,
                        imports: Map[String, String]): Set[String] = {
    val fqRefs = """\bgraft(?:\.[a-z][A-Za-z0-9_]*)*\.[A-Z][A-Za-z0-9_]*"""
      .r.findAllIn(block).toSet
    val simpleRefs = """\b([A-Z][A-Za-z0-9_]*)\b""".r
      .findAllMatchIn(block).map(_.group(1)).toSet
      .flatMap((n: String) => resolve(n, pkg, imports))
    fqRefs ++ simpleRefs
  }

  /** Scan one file's text for `ensure(...) { dir => ... }` sites and
    * return (siteCount, problems). Extracted so the planted-probe test
    * below can run the same logic over synthetic text. */
  private def checkEnsureSites(display: String, text: String): (Int, Seq[String]) = {
    val problems = Seq.newBuilder[String]
    var sites = 0
    val pkg = pkgRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    val imports = importsOf(text)
    val wildcards = wildcardRe.findAllMatchIn(text).map(_.group(1)).toSeq
    var idx = text.indexOf(".ensure(")
    while (idx >= 0) {
      val argsEnd = matchDelim(text, idx + ".ensure".length)
      val args = text.substring(idx + ".ensure(".length, argsEnd - 1)
      // the builder block follows the argument list
      var j = argsEnd
      while (j < text.length && text(j).isWhitespace) j += 1
      if (j < text.length && text(j) == '{') {
        sites += 1
        val blockEnd = matchDelim(text, j)
        val block = expandWithHelpers(text,
          stripNoise(text.substring(j, blockEnd)))
        val ownersIdx = args.indexOf("owners")
        val ownersExpr = if (ownersIdx < 0) "" else args.substring(ownersIdx)
        val owners: Set[String] =
          ownerClasses(text, ownersExpr)
            .flatMap(t => resolve(t, pkg, imports))
        val site = s"$display:${text.take(idx).count(_ == '\n') + 1}"
        if (owners.isEmpty)
          problems += s"$site: ensure call with no resolvable owners " +
            "(repo-global fingerprint — every graft commit invalidates it; " +
            "declare owners)"
        else {
          for (ref <- graftRefs(block, pkg, imports).toSeq.sorted
               if !covered(ref, owners))
            problems += s"$site: builder references $ref but owners " +
              s"only cover ${owners.toSeq.sorted.mkString(", ")}"
          // wildcard-imported bare member references (`tokens`,
          // `wordShingles`, `StopwordTable`, …): require the defining
          // object covered, then chase the member's body in ITS file for
          // further graft types (e.g. wordShingles → graft.plans
          // .WordShingles) and require those covered too.
          val blockIds =
            """\b[A-Za-z_][A-Za-z0-9_]*\b""".r.findAllIn(block).toSet
          for (w <- wildcards; (defPath, members) <- objectMembers.get(w).toSeq;
               m <- (blockIds intersect members).toSeq.sorted) {
            if (!covered(w, owners))
              problems += s"$site: builder uses wildcard-imported $w.$m " +
                s"but owners only cover ${owners.toSeq.sorted.mkString(", ")}"
            else {
              val defText = stripNoise(readAll(defPath))
              val body = expandWithHelpers(defText, s"$m()") +
                valRhs(defText, m).getOrElse("")
              val defPkg = pkgRe.findFirstMatchIn(defText)
                .map(_.group(1)).getOrElse("")
              for (ref <- graftRefs(body, defPkg, importsOf(defText)).toSeq.sorted
                   if ref != w && !covered(ref, owners))
                problems += s"$site: builder uses $w.$m which references " +
                  s"$ref, but owners only cover " +
                  owners.toSeq.sorted.mkString(", ")
            }
          }
        }
      }
      idx = text.indexOf(".ensure(", argsEnd)
    }
    (sites, problems.result())
  }

  test("every graft class referenced in an ensure builder block is in its owners list") {
    val problems = Seq.newBuilder[String]
    var sites = 0
    for (p <- sourceFiles) {
      val text = readAll(p)
      if (text.contains(".ensure(")) {
        val (n, ps) = checkEnsureSites(p.getFileName.toString, text)
        sites += n
        problems ++= ps
      }
    }
    // not vacuous: the artifact tier has 14 builders today; a parse
    // regression that stops finding builder blocks must fail loudly
    assert(sites >= 14, s"only $sites ensure builder blocks parsed — " +
      "the call-site pattern changed and this guard went blind")
    val ps = problems.result()
    assert(ps.isEmpty, "\n" + ps.mkString("\n"))
  }

  test("planted probe: wildcard-imported tokenizer without its owner is flagged") {
    // the EXACT round-11/12 escape shape: a builder that tokenizes via
    // `import graft.functions.TextFunctions._` bare names while owners
    // name only the query object — must now fail the guard
    val probe =
      """package graft.operators
        |import graft.functions.TextFunctions._
        |object ProbeQueries {
        |  def build(s: org.apache.spark.sql.SparkSession, d: String): String =
        |    graft.sources.IndexCatalog.ensure(s, "probe",
        |      owners = Seq(ProbeQueries.getClass, graft.Tables.getClass)) { dir =>
        |      graft.Tables.documents(s, d)
        |        .select(wordShingles(tokens(org.apache.spark.sql.functions.col("text")), 2))
        |        .write.parquet(dir)
        |    }
        |}
        |""".stripMargin
    val (sites, problems) = checkEnsureSites("Probe.scala", probe)
    assert(sites == 1)
    assert(problems.exists(_.contains("graft.functions.TextFunctions")),
      s"probe not flagged; problems=\n${problems.mkString("\n")}")
    // and the fixed form (owners covering tokenizer + fused plan) is clean
    val fixed = probe.replace(
      "owners = Seq(ProbeQueries.getClass, graft.Tables.getClass)",
      "owners = Seq(ProbeQueries.getClass, graft.Tables.getClass, " +
        "graft.functions.TextFunctions.getClass, " +
        "classOf[graft.plans.WordShingles])")
    val (_, cleanProblems) = checkEnsureSites("Probe.scala", fixed)
    assert(cleanProblems.isEmpty, cleanProblems.mkString("\n"))
  }
}
