/*
 * TemplateMatcherClient — JVM client for the template-matching executor.
 *
 * Counterpart of the reference's TemplateMatcherClient.kt
 * (bindings/kotlin/src/main/kotlin/co/marieai/client/TemplateMatcherClient.kt
 * in gregbugaj/marie-icr — SURVEY §2.6.3). Speaks to
 * marie_tpu/executor/template_matching_executor.py over the standard data
 * plane: register labelled template snippets on
 * `/template_matching/register`, match pages on `/document/matcher`.
 *
 * Image payloads ride the docs JSON as the server's ndarray envelope
 * ({"__ndarray__": <base64>, "dtype": "uint8", "shape": [h, w]} — see
 * marie_tpu/types/docs.py `_encode_ndarrays`), so no protobuf tensor
 * codegen is needed.
 */
package ai.marietpu.client

import jina.Marie
import java.nio.charset.StandardCharsets
import java.util.Base64

/** A grayscale uint8 image, row-major. */
data class GrayImage(val height: Int, val width: Int, val pixels: ByteArray) {
    init {
        require(pixels.size == height * width) {
            "pixels ${pixels.size} != $height*$width"
        }
    }
}

/** A labelled template snippet to register (reference "selector"). */
data class TemplateSelector(
    val label: String,
    val image: GrayImage,
    /** optional [x, y, w, h] region of interest inside [image] */
    val bbox: List<Int>? = null,
    /** optional expected text content (OCR-conditioned matching) */
    val text: String? = null,
)

data class TemplateMatchResult(
    val frameIndex: Int,
    val label: String,
    val bbox: List<Int>,
    val score: Double,
    val similarity: Double,
)

class TemplateMatcherClient(
    private val client: MarieClient,
) : AutoCloseable {

    constructor(
        host: String = "127.0.0.1",
        port: Int = 51000,
        apiKey: String? = null,
    ) : this(MarieClient(host, port, apiKey))

    private fun ndarrayJson(img: GrayImage): String {
        val b64 = Base64.getEncoder().encodeToString(img.pixels)
        return "{\"__ndarray__\":\"$b64\",\"dtype\":\"uint8\"," +
            "\"shape\":[${img.height},${img.width}]}"
    }

    private fun esc(s: String): String =
        s.replace("\\", "\\\\").replace("\"", "\\\"")

    /** Register templates; returns the labels the server accepted. */
    fun register(selectors: List<TemplateSelector>): List<String> {
        val docs = selectors.joinToString(",", "[", "]") { sel ->
            val tags = buildString {
                append("{\"label\":\"${esc(sel.label)}\"")
                sel.bbox?.let { append(",\"bbox\":[${it.joinToString(",")}]") }
                sel.text?.let { append(",\"text\":\"${esc(it)}\"") }
                append("}")
            }
            "{\"tensor\":${ndarrayJson(sel.image)},\"tags\":$tags}"
        }
        val resp = client.postRequest(
            client.buildRawRequest(
                "/template_matching/register", docs, selectors.size,
            )
        )
        val results = resultsOf(resp) ?: return emptyList()
        val reg = (results["registered"] as? List<*>) ?: return emptyList()
        return reg.map { it.toString() }
    }

    /** Match every registered template against the given page frames. */
    fun match(
        frames: List<GrayImage>,
        scoreThreshold: Double = 0.5,
        maxMatchesPerTemplate: Int = 5,
    ): List<TemplateMatchResult> {
        val docs = frames.joinToString(",", "[", "]") {
            "{\"tensor\":${ndarrayJson(it)}}"
        }
        val resp = client.postRequest(
            client.buildRawRequest(
                "/document/matcher", docs, frames.size,
                mapOf(
                    "score_threshold" to scoreThreshold,
                    "max_matches_per_template" to maxMatchesPerTemplate,
                ),
            )
        )
        val results = resultsOf(resp) ?: return emptyList()
        val matches = (results["matches"] as? List<*>) ?: return emptyList()
        return matches.mapNotNull { m ->
            val row = m as? Map<*, *> ?: return@mapNotNull null
            TemplateMatchResult(
                frameIndex = (row["frame_index"] as Number).toInt(),
                label = row["label"].toString(),
                bbox = (row["bbox"] as List<*>).map { (it as Number).toInt() },
                score = (row["score"] as Number).toDouble(),
                similarity = (row["similarity"] as Number).toDouble(),
            )
        }
    }

    /** Pull this executor's dict return out of parameters.__results__
     *  (parameters is a google.protobuf.Struct on the wire). */
    private fun resultsOf(resp: Marie.DataRequestProto): Map<String, Any?>? {
        val params = StructJson.toMap(resp.parameters)
        val results = params["__results__"] as? Map<*, *> ?: return null
        @Suppress("UNCHECKED_CAST")
        return results.values.firstOrNull() as? Map<String, Any?>
    }

    override fun close() = client.close()
}

/** google.protobuf.Struct -> plain Kotlin maps/lists/scalars. */
internal object StructJson {
    fun toMap(s: com.google.protobuf.Struct): Map<String, Any?> =
        s.fieldsMap.mapValues { fromValue(it.value) }

    private fun fromValue(v: com.google.protobuf.Value): Any? =
        when (v.kindCase) {
            com.google.protobuf.Value.KindCase.NULL_VALUE -> null
            com.google.protobuf.Value.KindCase.BOOL_VALUE -> v.boolValue
            com.google.protobuf.Value.KindCase.NUMBER_VALUE -> v.numberValue
            com.google.protobuf.Value.KindCase.STRING_VALUE -> v.stringValue
            com.google.protobuf.Value.KindCase.STRUCT_VALUE -> toMap(v.structValue)
            com.google.protobuf.Value.KindCase.LIST_VALUE ->
                v.listValue.valuesList.map { fromValue(it) }
            else -> null
        }
}

/** Minimal dependency-free JSON reader (objects → LinkedHashMap, arrays →
 *  ArrayList, numbers → Double/Long, null/true/false, strings with the
 *  standard escapes) — enough to read the server's parameters envelope. */
internal object Json {
    fun parse(s: String): Any? = Parser(s).run {
        val v = value()
        skipWs()
        v
    }

    private class Parser(private val s: String) {
        private var i = 0

        fun skipWs() {
            while (i < s.length && s[i].isWhitespace()) i++
        }

        fun value(): Any? {
            skipWs()
            return when (val c = s.getOrNull(i)) {
                '{' -> obj()
                '[' -> arr()
                '"' -> str()
                't' -> lit("true", true)
                'f' -> lit("false", false)
                'n' -> lit("null", null)
                else -> {
                    require(c != null) { "unexpected end of JSON" }
                    num()
                }
            }
        }

        private fun obj(): Map<String, Any?> {
            val out = LinkedHashMap<String, Any?>()
            i++ // {
            skipWs()
            if (s.getOrNull(i) == '}') { i++; return out }
            while (true) {
                skipWs()
                val k = str()
                skipWs()
                require(s[i] == ':') { "expected : at $i" }
                i++
                out[k] = value()
                skipWs()
                when (s.getOrNull(i)) {
                    ',' -> i++
                    '}' -> { i++; return out }
                    else -> throw IllegalArgumentException("expected , or } at $i")
                }
            }
        }

        private fun arr(): List<Any?> {
            val out = ArrayList<Any?>()
            i++ // [
            skipWs()
            if (s.getOrNull(i) == ']') { i++; return out }
            while (true) {
                out.add(value())
                skipWs()
                when (s.getOrNull(i)) {
                    ',' -> i++
                    ']' -> { i++; return out }
                    else -> throw IllegalArgumentException("expected , or ] at $i")
                }
            }
        }

        private fun str(): String {
            require(s[i] == '"') { "expected string at $i" }
            i++
            val sb = StringBuilder()
            while (s[i] != '"') {
                if (s[i] == '\\') {
                    i++
                    when (val e = s[i]) {
                        '"', '\\', '/' -> sb.append(e)
                        'n' -> sb.append('\n')
                        't' -> sb.append('\t')
                        'r' -> sb.append('\r')
                        'b' -> sb.append('\b')
                        'f' -> sb.append('\u000C')
                        'u' -> {
                            sb.append(s.substring(i + 1, i + 5).toInt(16).toChar())
                            i += 4
                        }
                        else -> throw IllegalArgumentException("bad escape \\$e")
                    }
                } else sb.append(s[i])
                i++
            }
            i++ // closing quote
            return sb.toString()
        }

        private fun num(): Any {
            val start = i
            while (i < s.length && (s[i].isDigit() || s[i] in "+-.eE")) i++
            val text = s.substring(start, i)
            return if (text.any { it in ".eE" }) text.toDouble() else text.toLong()
        }

        private fun <T> lit(word: String, v: T): T {
            require(s.startsWith(word, i)) { "bad literal at $i" }
            i += word.length
            return v
        }
    }
}
