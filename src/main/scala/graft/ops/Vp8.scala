package graft.ops

/** VP8 key-frame (intra) decoder — the lossy-WebP payload, RFC 6386.
  *
  * WebP lossy files contain exactly ONE VP8 key frame, so an
  * intra-only decoder IS full lossy-WebP coverage: boolean arithmetic
  * decoder (§7), key-frame headers (§9), segment/filter/quantizer
  * state, per-macroblock intra mode parsing with the contextual
  * kf B-mode probabilities (§11), token/coefficient decoding over the
  * four plane types with band and nonzero-context modeling (§13),
  * dequantization (§14.1), the 4x4 integer IDCT and the Y2 Walsh
  * transform (§14.3-4), all 4x4/8x8/16x16 intra predictors (§12), and
  * both loop filters (simple + normal, §15).
  *
  * The probability/dequant tables are the spec's own constants
  * (RFC 6386 §13.5/§14.1; cross-checked byte-for-byte against the
  * system libwebp's rodata, which ships the same public tables).
  * WebpSpec pins this decoder bit-exact against reference-decoder
  * (libwebp) YUV goldens over reference-encoded fixtures, plus
  * spec-side handwritten streams for the bool-coder/header layers.
  *
  * Output is the decoder's canonical YUV 4:2:0 (full macroblock-padded
  * planes + the uncropped dims); the RGB conversion for the pipeline
  * bridge lives with the caller ([[Multimodal.webpAsBmp]]), using the
  * same BT.601 limited-range integer approximation as every other
  * consumer of VP8 streams.
  *
  * Scale/robustness discipline matches the other codecs: decode work
  * is bounded by the same 16M-pixel bomb guard BEFORE plane
  * allocation, every read is bounds-checked through the partition
  * windows, and any malformed stream returns None - drop, don't
  * crash.
  */
object Vp8 {
  val DefaultCoeffProbs: Array[Int] = Array(
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
    189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128, 106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128,
    1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128, 181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128,
    78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128, 1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128,
    184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128, 77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128, 170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128,
    37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128, 1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128, 102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128,
    1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128, 177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128,
    80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62, 131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1,
    68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128, 1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128,
    184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128, 81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128,
    1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128, 99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128, 1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128,
    109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128, 44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128, 94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128,
    22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128, 1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128,
    124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128, 35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128,
    1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128, 121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128,
    45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128, 1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128,
    203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128, 137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128, 175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128,
    73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128, 1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128,
    239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128, 155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128,
    1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128, 201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128,
    69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128, 1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128,
    223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128, 141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128, 190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128,
    149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128, 240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128, 213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128,
    55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255, 126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128,
    61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128, 1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128,
    166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128, 39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128,
    1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128, 124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128, 1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128,
    149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128, 28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128, 123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128,
    20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128, 1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128,
    168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128, 47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128,
    1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128, 141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128,
    42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128, 1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128, 238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)

  val CoeffUpdateProbs: Array[Int] = Array(
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255, 249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255, 234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255, 250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255,
    234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255, 249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255, 234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255,
    251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255, 255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255, 248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255, 253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255, 252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)

  val KfBModeProbs: Array[Int] = Array(
    231, 120, 48, 89, 115, 113, 120, 152, 112, 152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103, 56, 58, 10, 171, 218, 189, 17, 13, 152,
    114, 26, 17, 163, 44, 195, 21, 10, 173, 121, 24, 80, 195, 26, 62, 44, 64, 85,
    144, 71, 10, 38, 171, 213, 144, 34, 26, 170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226, 81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148, 72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128, 41, 53, 9, 178, 241, 141, 26, 8, 107,
    74, 43, 26, 146, 73, 166, 49, 23, 157, 65, 38, 105, 160, 51, 52, 31, 115, 128,
    104, 79, 12, 27, 217, 255, 87, 17, 7, 87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194, 66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205, 43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171, 56, 34, 51, 104, 114, 102, 29, 93, 77,
    39, 28, 85, 171, 58, 165, 90, 98, 64, 34, 22, 116, 206, 23, 34, 43, 166, 73,
    107, 54, 32, 26, 51, 1, 81, 43, 31, 68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124, 62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111, 60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114, 40, 42, 1, 196, 245, 209, 10, 25, 109,
    88, 43, 29, 140, 166, 213, 37, 43, 154, 61, 63, 30, 155, 67, 45, 68, 1, 209,
    100, 80, 8, 43, 154, 1, 51, 26, 71, 142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221, 51, 50, 17, 168, 209, 192, 23, 25, 82,
    138, 31, 36, 171, 27, 166, 38, 44, 229, 67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154, 40, 40, 21, 116, 143, 209, 34, 39, 175,
    47, 15, 16, 183, 34, 223, 49, 45, 183, 46, 17, 33, 183, 6, 98, 15, 32, 183,
    57, 46, 22, 24, 128, 1, 54, 17, 37, 65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223, 87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226, 64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213, 30, 34, 26, 133, 152, 116, 10, 32, 134,
    39, 19, 53, 221, 26, 114, 32, 73, 255, 31, 9, 65, 234, 2, 15, 1, 118, 73,
    75, 32, 12, 51, 192, 255, 160, 43, 51, 88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192, 55, 38, 70, 124, 73, 102, 1, 34, 98,
    125, 98, 42, 88, 104, 85, 117, 175, 82, 95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1, 57, 17, 5, 71, 102, 57, 53, 41, 49,
    38, 33, 13, 121, 57, 73, 26, 1, 85, 41, 10, 67, 138, 77, 110, 90, 47, 114,
    115, 21, 2, 10, 102, 255, 166, 23, 6, 101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43, 117, 20, 15, 36, 163, 128, 68, 1, 26,
    102, 61, 71, 37, 34, 53, 31, 243, 192, 69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171, 62, 17, 19, 70, 146, 85, 55, 62, 70,
    37, 43, 37, 154, 100, 163, 85, 160, 1, 63, 9, 92, 136, 28, 64, 32, 201, 85,
    75, 15, 9, 9, 64, 255, 184, 119, 16, 86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128, 58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218, 51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128, 22, 26, 17, 131, 240, 154, 14, 1, 209,
    45, 16, 21, 91, 64, 222, 7, 1, 197, 56, 21, 39, 155, 60, 138, 23, 102, 213,
    83, 12, 13, 54, 192, 255, 68, 47, 28, 85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246, 35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45, 85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85, 56, 41, 15, 176, 236, 85, 37, 9, 62,
    71, 30, 17, 119, 118, 255, 17, 18, 138, 101, 38, 60, 138, 55, 70, 43, 26, 142,
    146, 36, 19, 30, 171, 255, 97, 27, 20, 138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163, 112, 19, 12, 61, 195, 128, 48, 4, 24)

  val DcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)

  val AcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  /** Coefficient-position → probability band (§13.3). */
  private val CoeffBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** Zigzag: coefficient order → raster position in the 4x4 block. */
  private val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // Intra mode codes (16x16/chroma): DC=0 V=1 H=2 TM=3, B_PRED=4.
  // B submodes: DC=0 TM=1 VE=2 HE=3 RD=4 VR=5 LD=6 VL=7 HD=8 HU=9 —
  // the numbering [[KfBModeProbs]] is indexed by (its rows were
  // extracted in this order; the RFC's enum swaps RD/VR/LD to 5/6/4,
  // so the tree below re-targets those three leaves to keep the
  // BITSTREAM mapping identical while the table stays consistent).

  /** Key-frame 16x16 mode tree + fixed probs (§11.2). */
  private val KfYModeTree = Array(-4, 2, 4, 6, 0, -1, -2, -3)
  private val KfYModeProbs = Array(145, 156, 163, 128)

  /** Chroma mode tree + key-frame probs (§11.2). */
  private val UvModeTree = Array(0, 2, -1, 4, -2, -3)
  private val KfUvModeProbs = Array(142, 114, 183)

  /** 4x4 submode tree (§11.2); probs are contextual ([[KfBModeProbs]],
    * indexed [above submode][left submode][9]). */
  private val BModeTree = Array(
    0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)

  /** Segment-id tree (§10). */
  private val SegmentTree = Array(2, 4, 0, -1, -2, -3)

  /** Token extra-bit probabilities, categories 1-6 (§13.2), and the
    * category base values. */
  private val Cat1 = Array(159)
  private val Cat2 = Array(165, 145)
  private val Cat3 = Array(173, 148, 140)
  private val Cat4 = Array(176, 155, 140, 135)
  private val Cat5 = Array(180, 157, 141, 134, 130)
  private val Cat6 =
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)

  /** §7 boolean arithmetic decoder over one partition window. Reads
    * past the window yield zero bits (the spec's defined behavior for
    * streams that end mid-symbol). */
  private final class Bool(c: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private var pos = start
    // Prime with 2 bytes (RFC 7.3 init).
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val b = c(pos) & 0xFF; pos += 1; b } else 0

    /** One bool with 8-bit probability `prob` of a 0 (RFC 7.3). */
    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) {
        ret = 1
        range -= split
        value -= bigSplit
      } else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          value |= nextByte()
        }
      }
      ret
    }

    /** `n` raw bits (probability 1/2), MSB first. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }

    /** Magnitude + sign-bit form used by the header deltas. */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bit(128) == 1) -v else v
    }

    /** §8 tree decode: negative entries are leaves (value = -entry). */
    def tree(t: Array[Int], probs: Array[Int], pOff: Int = 0): Int = {
      var i = t(if (bit(probs(pOff)) == 1) 1 else 0)
      while (i > 0) i = t(i + bit(probs(pOff + (i >> 1))))
      -i
    }
  }

  /** Decoded frame: MB-padded planes; crop to (w, h) for display. */
  final case class Yuv(w: Int, h: Int, yStride: Int, uvStride: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private val MaxVp8Pixels = 16L << 20

  /** Frame dims straight off the uncompressed key-frame header — the
    * cheap-metadata path (no entropy decode). */
  def dims(c: Array[Byte], off: Int, len: Int): Option[(Int, Int)] = {
    if (len < 10 || off + 10 > c.length) return None
    val b0 = c(off) & 0xFF
    if ((b0 & 1) != 0) return None // not a key frame
    if ((c(off + 3) & 0xFF) != 0x9D || (c(off + 4) & 0xFF) != 0x01 ||
      (c(off + 5) & 0xFF) != 0x2A) return None
    val w = ((c(off + 6) & 0xFF) | ((c(off + 7) & 0xFF) << 8)) & 0x3FFF
    val h = ((c(off + 8) & 0xFF) | ((c(off + 9) & 0xFF) << 8)) & 0x3FFF
    if (w == 0 || h == 0) None else Some((w, h))
  }

  private def clip127(v: Int): Int = if (v < 0) 0 else if (v > 127) v.min(127) else v

  /** Decode one key frame from `c[off, off+len)`. */
  def decodeFrame(c: Array[Byte], off: Int, len: Int): Option[Yuv] = try {
    if (len < 10 || off + len > c.length) return None
    val b0 = (c(off) & 0xFF) | ((c(off + 1) & 0xFF) << 8) |
      ((c(off + 2) & 0xFF) << 16)
    if ((b0 & 1) != 0) return None // inter frame: not in WebP
    val firstPartSize = b0 >> 5
    val (w, h) = dims(c, off, len).getOrElse(return None)
    if (w.toLong * h > MaxVp8Pixels) return None
    val part0Start = off + 10
    val part0End = part0Start + firstPartSize
    if (part0End > off + len) return None
    val bd = new Bool(c, part0Start, part0End)

    // ---- frame header (§9.2-9.11) ----
    bd.bit(128) // color space (0 in WebP)
    bd.bit(128) // clamping type
    // Segmentation.
    var segEnabled = false
    var segUpdateMap = false
    var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.bit(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.bit(128) == 1
      val updateData = bd.bit(128) == 1
      if (updateData) {
        segAbsDelta = bd.bit(128) == 1
        var i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) segQuant(i) = bd.signedLiteral(7)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) segLf(i) = bd.signedLiteral(6)
          i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bit(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    // Loop filter.
    val simpleFilter = bd.bit(128) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.bit(128) == 1) {
      lfDeltaEnabled = true
      if (bd.bit(128) == 1) { // mode_ref_lf_delta_update
        var i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) refLfDelta(i) = bd.signedLiteral(6)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bit(128) == 1) modeLfDelta(i) = bd.signedLiteral(6)
          i += 1
        }
      }
    }
    // Token partitions.
    val nParts = 1 << bd.literal(2)
    val partsTableOff = part0End
    val partsDataOff = partsTableOff + 3 * (nParts - 1)
    if (partsDataOff > off + len) return None
    val partStarts = new Array[Int](nParts)
    val partEnds = new Array[Int](nParts)
    var po = partsDataOff
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) off + len - po
        else {
          val t = partsTableOff + 3 * pi
          (c(t) & 0xFF) | ((c(t + 1) & 0xFF) << 8) | ((c(t + 2) & 0xFF) << 16)
        }
      if (sz < 0 || po + sz > off + len) return None
      partStarts(pi) = po
      partEnds(pi) = po + sz
      po += sz
      pi += 1
    }
    // Quantizer indices (§9.6).
    val yAcQi = bd.literal(7)
    def qDelta(): Int = if (bd.bit(128) == 1) bd.signedLiteral(4) else 0
    val yDcDelta = qDelta()
    val y2DcDelta = qDelta()
    val y2AcDelta = qDelta()
    val uvDcDelta = qDelta()
    val uvAcDelta = qDelta()
    // Per-segment dequant factors (§14.1).
    val dqYDc = new Array[Int](4); val dqYAc = new Array[Int](4)
    val dqY2Dc = new Array[Int](4); val dqY2Ac = new Array[Int](4)
    val dqUvDc = new Array[Int](4); val dqUvAc = new Array[Int](4)
    var si = 0
    while (si < 4) {
      val q =
        if (!segEnabled) yAcQi
        else if (segAbsDelta) segQuant(si)
        else yAcQi + segQuant(si)
      val qc = clip127(q)
      dqYDc(si) = DcQLookup(clip127(qc + yDcDelta))
      dqYAc(si) = AcQLookup(qc)
      dqY2Dc(si) = DcQLookup(clip127(qc + y2DcDelta)) * 2
      dqY2Ac(si) = {
        val v = AcQLookup(clip127(qc + y2AcDelta)) * 155 / 100
        if (v < 8) 8 else v
      }
      // Chroma DC: the lookup INDEX is clamped at 117 (§14.1).
      dqUvDc(si) = DcQLookup(math.min(clip127(qc + uvDcDelta), 117))
      dqUvAc(si) = AcQLookup(clip127(qc + uvAcDelta))
      si += 1
    }
    bd.bit(128) // refresh entropy probs (key frame: ignored)
    // Coefficient probability updates (§13.4).
    val coeffProbs = DefaultCoeffProbs.clone()
    var k = 0
    while (k < 1056) {
      if (bd.bit(CoeffUpdateProbs(k)) == 1) coeffProbs(k) = bd.literal(8)
      k += 1
    }
    val mbNoSkip = bd.bit(128) == 1
    val skipProb = if (mbNoSkip) bd.literal(8) else 0

    // ---- per-MB intra modes (rest of partition 0, §11) ----
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val yMode = new Array[Byte](mbW * mbH)
    val uvMode = new Array[Byte](mbW * mbH)
    val segOf = new Array[Byte](mbW * mbH)
    val skipFlag = new Array[Boolean](mbW * mbH)
    val bModes = new Array[Byte](mbW * mbH * 16) // valid when yMode==4
    // Submode context rows: above per MB column (4 entries), left (4).
    val aboveSub = new Array[Byte](mbW * 4) // B_DC=0 default
    val leftSub = new Array[Byte](4)
    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftSub, 0.toByte)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        if (segUpdateMap)
          segOf(mi) = bd.tree(SegmentTree, segTreeProbs).toByte
        if (mbNoSkip) skipFlag(mi) = bd.bit(skipProb) == 1
        val ym = bd.tree(KfYModeTree, KfYModeProbs)
        yMode(mi) = ym.toByte
        if (ym == 4) { // B_PRED: 16 contextual submodes
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3
            val sy = sb >> 2
            val above =
              if (sy > 0) bModes(mi * 16 + sb - 4)
              else aboveSub(mbX * 4 + sx)
            val left =
              if (sx > 0) bModes(mi * 16 + sb - 1)
              else leftSub(sy)
            val m = bd.tree(BModeTree, KfBModeProbs,
              (above * 10 + left) * 9)
            bModes(mi * 16 + sb) = m.toByte
            if (sy == 3) aboveSub(mbX * 4 + sx) = m.toByte
            if (sx == 3) leftSub(sy) = m.toByte
            sb += 1
          }
        } else {
          // 16x16 modes expose a fixed equivalent submode to their
          // B_PRED neighbors (§11.3): DC->B_DC, V->B_VE, H->B_HE,
          // TM->B_TM.
          val sub = ym match {
            case 0 => 0; case 1 => 2; case 2 => 3; case _ => 1
          }
          var j = 0
          while (j < 4) {
            aboveSub(mbX * 4 + j) = sub.toByte
            leftSub(j) = sub.toByte
            j += 1
          }
        }
        uvMode(mi) = bd.tree(UvModeTree, KfUvModeProbs).toByte
        mbX += 1
      }
      mbY += 1
    }

    // ---- planes (MB-padded) ----
    val yStride = mbW * 16
    val uvStride = mbW * 8
    val yP = new Array[Byte](yStride * mbH * 16)
    val uP = new Array[Byte](uvStride * mbH * 8)
    val vP = new Array[Byte](uvStride * mbH * 8)

    // ---- token decoders, one per partition (rows interleave) ----
    val tokenBd = Array.tabulate(nParts)(i =>
      new Bool(c, partStarts(i), partEnds(i)))

    // ---- §13 coefficient decode for one 4x4 block ----
    // probs layout: coeffProbs(((typ * 8 + band) * 3 + ctx) * 11 + i).
    // Returns the number of coefficients consumed (0 => all-zero block).
    val blockCoeffs = new Array[Int](25 * 16)
    def decodeCoeffs(td: Bool, typ: Int, ctx0: Int, first: Int,
        dcQ: Int, acQ: Int, out: Array[Int], outOff: Int): Int = {
      var n = first
      var pOff = ((typ * 8 + CoeffBands(n)) * 3 + ctx0) * 11
      var done = false
      while (!done && n < 16) {
        if (td.bit(coeffProbs(pOff)) == 0) done = true // EOB
        else {
          // Zero run: no EOB allowed immediately after a zero.
          var zeroDone = false
          while (!zeroDone && td.bit(coeffProbs(pOff + 1)) == 0) {
            n += 1
            if (n == 16) { zeroDone = true; done = true }
            else pOff = ((typ * 8 + CoeffBands(n)) * 3 + 0) * 11
          }
          if (!done) {
            var v = 0
            var nextCtx = 2
            if (td.bit(coeffProbs(pOff + 2)) == 0) { v = 1; nextCtx = 1 }
            else if (td.bit(coeffProbs(pOff + 3)) == 0) {
              if (td.bit(coeffProbs(pOff + 4)) == 0) v = 2
              else v = 3 + td.bit(coeffProbs(pOff + 5))
            } else if (td.bit(coeffProbs(pOff + 6)) == 0) {
              if (td.bit(coeffProbs(pOff + 7)) == 0)
                v = 5 + td.bit(Cat1(0))
              else v = 7 + 2 * td.bit(Cat2(0)) + td.bit(Cat2(1))
            } else {
              val bit1 = td.bit(coeffProbs(pOff + 8))
              val bit0 = td.bit(coeffProbs(pOff + 9 + bit1))
              val (tab, base) = (2 * bit1 + bit0) match {
                case 0 => (Cat3, 11)
                case 1 => (Cat4, 19)
                case 2 => (Cat5, 35)
                case _ => (Cat6, 67)
              }
              var e = 0
              var ti = 0
              while (ti < tab.length) {
                e = (e << 1) | td.bit(tab(ti)); ti += 1
              }
              v = base + e
            }
            if (td.bit(128) == 1) v = -v
            // Dequantized coefficients live in int16 storage in the
            // reference decoder (RFC 6386) — oversized values WRAP,
            // and bit-exactness requires reproducing that.
            out(outOff + Zigzag(n)) = (v * (if (n > 0) acQ else dcQ)).toShort.toInt
            n += 1
            if (n < 16) pOff = ((typ * 8 + CoeffBands(n)) * 3 + nextCtx) * 11
            else done = true
          }
        }
      }
      n - first
    }

    // ---- transforms (§14.3-4) ----
    def idct4(b: Array[Int], o: Int): Unit = {
      var i = 0
      while (i < 4) { // columns
        val a1 = b(o + i) + b(o + i + 8)
        val b1 = b(o + i) - b(o + i + 8)
        val c1 = ((b(o + i + 4) * 35468) >> 16) -
          (b(o + i + 12) + ((b(o + i + 12) * 20091) >> 16))
        val d1 = (b(o + i + 4) + ((b(o + i + 4) * 20091) >> 16)) +
          ((b(o + i + 12) * 35468) >> 16)
        b(o + i) = a1 + d1; b(o + i + 12) = a1 - d1
        b(o + i + 4) = b1 + c1; b(o + i + 8) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 16) { // rows, with final rounding
        val a1 = b(o + i) + b(o + i + 2)
        val b1 = b(o + i) - b(o + i + 2)
        val c1 = ((b(o + i + 1) * 35468) >> 16) -
          (b(o + i + 3) + ((b(o + i + 3) * 20091) >> 16))
        val d1 = (b(o + i + 1) + ((b(o + i + 1) * 20091) >> 16)) +
          ((b(o + i + 3) * 35468) >> 16)
        b(o + i) = (a1 + d1 + 4) >> 3; b(o + i + 3) = (a1 - d1 + 4) >> 3
        b(o + i + 1) = (b1 + c1 + 4) >> 3; b(o + i + 2) = (b1 - c1 + 4) >> 3
        i += 4
      }
    }

    val y2block = new Array[Int](16)
    def iwht(b: Array[Int]): Unit = {
      var i = 0
      while (i < 4) {
        val a1 = b(i) + b(i + 12); val b1 = b(i + 4) + b(i + 8)
        val c1 = b(i + 4) - b(i + 8); val d1 = b(i) - b(i + 12)
        b(i) = a1 + b1; b(i + 4) = c1 + d1
        b(i + 8) = a1 - b1; b(i + 12) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 16) {
        val a1 = b(i) + b(i + 3); val b1 = b(i + 1) + b(i + 2)
        val c1 = b(i + 1) - b(i + 2); val d1 = b(i) - b(i + 3)
        b(i) = (a1 + b1 + 3) >> 3; b(i + 1) = (c1 + d1 + 3) >> 3
        b(i + 2) = (a1 - b1 + 3) >> 3; b(i + 3) = (d1 - c1 + 3) >> 3
        i += 4
      }
    }

    // ---- prediction helpers (§12) ----
    def clip8(v: Int): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
    def avg3(a: Int, b: Int, c0: Int): Int = (a + 2 * b + c0 + 2) >> 2

    // Neighbor reads with the spec's frame-edge defaults: above row
    // 127, left column 129, above-left 129 on the left edge (127 on
    // the top row).
    def px(p: Array[Byte], stride: Int, x: Int, y: Int): Int =
      if (y < 0) 127 // above row (and the frame corner) default
      else if (x < 0) 129 // left column default
      else p(y * stride + x) & 0xFF

    def predDc(p: Array[Byte], stride: Int, x0: Int, y0: Int, n: Int,
        haveA: Boolean, haveL: Boolean): Int = {
      if (!haveA && !haveL) return 128
      var s = 0
      var cnt = 0
      if (haveA) { var i = 0; while (i < n) { s += px(p, stride, x0 + i, y0 - 1); i += 1 }; cnt += n }
      if (haveL) { var i = 0; while (i < n) { s += px(p, stride, x0 - 1, y0 + i); i += 1 }; cnt += n }
      (s + cnt / 2) / cnt
    }

    /** Whole-block intra prediction for n x n (n = 16 or 8). */
    def predBlock(p: Array[Byte], stride: Int, x0: Int, y0: Int, n: Int,
        mode: Int): Unit = {
      val haveA = y0 > 0
      val haveL = x0 > 0
      mode match {
        case 0 => // DC
          val dcv = predDc(p, stride, x0, y0, n, haveA, haveL).toByte
          var y = 0
          while (y < n) {
            var x = 0
            while (x < n) { p((y0 + y) * stride + x0 + x) = dcv; x += 1 }
            y += 1
          }
        case 1 => // V
          var y = 0
          while (y < n) {
            var x = 0
            while (x < n) {
              p((y0 + y) * stride + x0 + x) =
                px(p, stride, x0 + x, y0 - 1).toByte
              x += 1
            }
            y += 1
          }
        case 2 => // H
          var y = 0
          while (y < n) {
            val l = px(p, stride, x0 - 1, y0 + y).toByte
            var x = 0
            while (x < n) { p((y0 + y) * stride + x0 + x) = l; x += 1 }
            y += 1
          }
        case _ => // TM
          val al = px(p, stride, x0 - 1, y0 - 1)
          var y = 0
          while (y < n) {
            val l = px(p, stride, x0 - 1, y0 + y)
            var x = 0
            while (x < n) {
              p((y0 + y) * stride + x0 + x) =
                clip8(l + px(p, stride, x0 + x, y0 - 1) - al)
              x += 1
            }
            y += 1
          }
      }
    }

    /** 4x4 submode prediction into the Y plane at (x0, y0). `ar` is
      * the 4-pixel above-right row (the spec's quirky availability
      * rules are resolved by the caller). */
    val arBuf = new Array[Int](4)
    def predB(x0: Int, y0: Int, mode: Int): Unit = {
      val s = yStride
      def t(i: Int): Int = if (i < 4) px(yP, s, x0 + i, y0 - 1) else arBuf(i - 4)
      def l(i: Int): Int = px(yP, s, x0 - 1, y0 + i)
      val xx = px(yP, s, x0 - 1, y0 - 1)
      @inline def set(cx: Int, cy: Int, v: Int): Unit =
        yP((y0 + cy) * s + x0 + cx) = v.toByte
      mode match {
        case 0 => // B_DC: 4 above + 4 left, +4 >> 3
          var sm = 4
          var i = 0
          while (i < 4) { sm += t(i) + l(i); i += 1 }
          val dcv = (sm >> 3).toByte
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) { yP((y0 + y) * s + x0 + x) = dcv; x += 1 }
            y += 1
          }
        case 1 => // B_TM
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) { set(x, y, clip8(l(y) + t(x) - xx).toInt); x += 1 }
            y += 1
          }
        case 2 => // B_VE: smoothed above (uses above-right[0])
          val v0 = avg3(xx, t(0), t(1)); val v1 = avg3(t(0), t(1), t(2))
          val v2 = avg3(t(1), t(2), t(3)); val v3 = avg3(t(2), t(3), t(4))
          var y = 0
          while (y < 4) { set(0, y, v0); set(1, y, v1); set(2, y, v2); set(3, y, v3); y += 1 }
        case 3 => // B_HE
          val h0 = avg3(xx, l(0), l(1)); val h1 = avg3(l(0), l(1), l(2))
          val h2 = avg3(l(1), l(2), l(3)); val h3 = avg3(l(2), l(3), l(3))
          var x = 0
          while (x < 4) { set(x, 0, h0); set(x, 1, h1); set(x, 2, h2); set(x, 3, h3); x += 1 }
        case 6 => // B_LD (down-left)
          set(0, 0, avg3(t(0), t(1), t(2)))
          set(1, 0, avg3(t(1), t(2), t(3))); set(0, 1, avg3(t(1), t(2), t(3)))
          set(2, 0, avg3(t(2), t(3), t(4))); set(1, 1, avg3(t(2), t(3), t(4))); set(0, 2, avg3(t(2), t(3), t(4)))
          set(3, 0, avg3(t(3), t(4), t(5))); set(2, 1, avg3(t(3), t(4), t(5))); set(1, 2, avg3(t(3), t(4), t(5))); set(0, 3, avg3(t(3), t(4), t(5)))
          set(3, 1, avg3(t(4), t(5), t(6))); set(2, 2, avg3(t(4), t(5), t(6))); set(1, 3, avg3(t(4), t(5), t(6)))
          set(3, 2, avg3(t(5), t(6), t(7))); set(2, 3, avg3(t(5), t(6), t(7)))
          set(3, 3, avg3(t(6), t(7), t(7)))
        case 4 => // B_RD (down-right)
          set(3, 0, avg3(t(3), t(2), t(1)))
          set(2, 0, avg3(t(2), t(1), t(0))); set(3, 1, avg3(t(2), t(1), t(0)))
          set(1, 0, avg3(t(1), t(0), xx)); set(2, 1, avg3(t(1), t(0), xx)); set(3, 2, avg3(t(1), t(0), xx))
          set(0, 0, avg3(t(0), xx, l(0))); set(1, 1, avg3(t(0), xx, l(0))); set(2, 2, avg3(t(0), xx, l(0))); set(3, 3, avg3(t(0), xx, l(0)))
          set(0, 1, avg3(xx, l(0), l(1))); set(1, 2, avg3(xx, l(0), l(1))); set(2, 3, avg3(xx, l(0), l(1)))
          set(0, 2, avg3(l(0), l(1), l(2))); set(1, 3, avg3(l(0), l(1), l(2)))
          set(0, 3, avg3(l(1), l(2), l(3)))
        case 5 => // B_VR (vertical-right)
          set(0, 0, avg2(xx, t(0))); set(1, 2, avg2(xx, t(0)))
          set(1, 0, avg2(t(0), t(1))); set(2, 2, avg2(t(0), t(1)))
          set(2, 0, avg2(t(1), t(2))); set(3, 2, avg2(t(1), t(2)))
          set(3, 0, avg2(t(2), t(3)))
          set(0, 3, avg3(l(2), l(1), l(0)))
          set(0, 2, avg3(l(1), l(0), xx))
          set(0, 1, avg3(l(0), xx, t(0))); set(1, 3, avg3(l(0), xx, t(0)))
          set(1, 1, avg3(xx, t(0), t(1))); set(2, 3, avg3(xx, t(0), t(1)))
          set(2, 1, avg3(t(0), t(1), t(2))); set(3, 3, avg3(t(0), t(1), t(2)))
          set(3, 1, avg3(t(1), t(2), t(3)))
        case 7 => // B_VL (vertical-left)
          set(0, 0, avg2(t(0), t(1)))
          set(1, 0, avg2(t(1), t(2))); set(0, 2, avg2(t(1), t(2)))
          set(2, 0, avg2(t(2), t(3))); set(1, 2, avg2(t(2), t(3)))
          set(3, 0, avg2(t(3), t(4))); set(2, 2, avg2(t(3), t(4)))
          set(0, 1, avg3(t(0), t(1), t(2)))
          set(1, 1, avg3(t(1), t(2), t(3))); set(0, 3, avg3(t(1), t(2), t(3)))
          set(2, 1, avg3(t(2), t(3), t(4))); set(1, 3, avg3(t(2), t(3), t(4)))
          set(3, 1, avg3(t(3), t(4), t(5))); set(2, 3, avg3(t(3), t(4), t(5)))
          set(3, 2, avg3(t(4), t(5), t(6)))
          set(3, 3, avg3(t(5), t(6), t(7)))
        case 8 => // B_HD (horizontal-down)
          set(0, 0, avg2(l(0), xx)); set(2, 1, avg2(l(0), xx))
          set(0, 1, avg2(l(1), l(0))); set(2, 2, avg2(l(1), l(0)))
          set(0, 2, avg2(l(2), l(1))); set(2, 3, avg2(l(2), l(1)))
          set(0, 3, avg2(l(3), l(2)))
          set(3, 0, avg3(t(0), t(1), t(2)))
          set(2, 0, avg3(xx, t(0), t(1)))
          set(1, 0, avg3(l(0), xx, t(0))); set(3, 1, avg3(l(0), xx, t(0)))
          set(1, 1, avg3(xx, l(0), l(1))); set(3, 2, avg3(xx, l(0), l(1)))
          set(1, 2, avg3(l(0), l(1), l(2))); set(3, 3, avg3(l(0), l(1), l(2)))
          set(1, 3, avg3(l(1), l(2), l(3)))
        case _ => // B_HU (horizontal-up)
          set(0, 0, avg2(l(0), l(1)))
          set(2, 0, avg2(l(1), l(2))); set(0, 1, avg2(l(1), l(2)))
          set(2, 1, avg2(l(2), l(3))); set(0, 2, avg2(l(2), l(3)))
          set(1, 0, avg3(l(0), l(1), l(2)))
          set(3, 0, avg3(l(1), l(2), l(3))); set(1, 1, avg3(l(1), l(2), l(3)))
          set(3, 1, avg3(l(2), l(3), l(3))); set(1, 2, avg3(l(2), l(3), l(3)))
          set(3, 2, l(3)); set(2, 2, l(3))
          set(0, 3, l(3)); set(1, 3, l(3)); set(2, 3, l(3)); set(3, 3, l(3))
      }
    }

    /** Add one 4x4 residual block onto a plane. */
    def addResidual(p: Array[Byte], stride: Int, x0: Int, y0: Int,
        b: Array[Int], o: Int): Unit = {
      var y = 0
      while (y < 4) {
        var x = 0
        while (x < 4) {
          val i = (y0 + y) * stride + x0 + x
          p(i) = clip8((p(i) & 0xFF) + b(o + y * 4 + x))
          x += 1
        }
        y += 1
      }
    }

    // ---- per-MB decode + reconstruct ----
    val aboveNzY = new Array[Boolean](mbW * 4)
    val leftNzY = new Array[Boolean](4)
    val aboveNzU = new Array[Boolean](mbW * 2)
    val leftNzU = new Array[Boolean](2)
    val aboveNzV = new Array[Boolean](mbW * 2)
    val leftNzV = new Array[Boolean](2)
    val aboveNzY2 = new Array[Boolean](mbW)
    var leftNzY2 = false
    val hasCoeffsOf = new Array[Boolean](mbW * mbH)

    mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftNzY, false)
      java.util.Arrays.fill(leftNzU, false)
      java.util.Arrays.fill(leftNzV, false)
      leftNzY2 = false
      val td = tokenBd(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        val seg = segOf(mi).toInt
        val ym = yMode(mi).toInt
        val hasY2 = ym != 4
        java.util.Arrays.fill(blockCoeffs, 0)
        var anyNz = false
        if (!skipFlag(mi)) {
          if (hasY2) {
            val ctx = (if (leftNzY2) 1 else 0) + (if (aboveNzY2(mbX)) 1 else 0)
            java.util.Arrays.fill(y2block, 0)
            val n = decodeCoeffs(td, 1, ctx, 0, dqY2Dc(seg), dqY2Ac(seg),
              y2block, 0)
            val nz = n > 0
            leftNzY2 = nz; aboveNzY2(mbX) = nz
            if (nz) anyNz = true
            iwht(y2block)
            var sb = 0
            while (sb < 16) { blockCoeffs(sb * 16) = y2block(sb); sb += 1 }
          }
          val yTyp = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var sb = 0
          val nzBuf = new Array[Boolean](16)
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val leftFlag = if (sx == 0) leftNzY(sy) else nzBuf(sb - 1)
            val aboveFlag = if (sy == 0) aboveNzY(mbX * 4 + sx) else nzBuf(sb - 4)
            val ctx = (if (leftFlag) 1 else 0) + (if (aboveFlag) 1 else 0)
            val n = decodeCoeffs(td, yTyp, ctx, yFirst, dqYDc(seg),
              dqYAc(seg), blockCoeffs, sb * 16)
            val nz = n > 0
            nzBuf(sb) = nz
            if (nz) anyNz = true
            if (sx == 3) leftNzY(sy) = nz
            if (sy == 3) aboveNzY(mbX * 4 + sx) = nz
            sb += 1
          }
          // chroma: U then V, each 4 subblocks (2x2)
          var pl = 0
          while (pl < 2) {
            val aN = if (pl == 0) aboveNzU else aboveNzV
            val lN = if (pl == 0) leftNzU else leftNzV
            val nzC = new Array[Boolean](4)
            var cb = 0
            while (cb < 4) {
              val cx = cb & 1; val cy = cb >> 1
              val leftFlag = if (cx == 0) lN(cy) else nzC(cb - 1)
              val aboveFlag = if (cy == 0) aN(mbX * 2 + cx) else nzC(cb - 2)
              val ctx = (if (leftFlag) 1 else 0) + (if (aboveFlag) 1 else 0)
              val n = decodeCoeffs(td, 2, ctx, 0, dqUvDc(seg), dqUvAc(seg),
                blockCoeffs, (16 + pl * 4 + cb) * 16)
              val nz = n > 0
              nzC(cb) = nz
              if (nz) anyNz = true
              if (cx == 1) lN(cy) = nz
              if (cy == 1) aN(mbX * 2 + cx) = nz
              cb += 1
            }
            pl += 1
          }
        } else {
          // Skipped MB: zero coefficients; contexts reset — except the
          // Y2 context, which only resets when the MB HAS a Y2 block.
          java.util.Arrays.fill(leftNzY, false)
          java.util.Arrays.fill(leftNzU, false)
          java.util.Arrays.fill(leftNzV, false)
          var j = 0
          while (j < 4) { aboveNzY(mbX * 4 + j) = false; j += 1 }
          j = 0
          while (j < 2) {
            aboveNzU(mbX * 2 + j) = false; aboveNzV(mbX * 2 + j) = false
            j += 1
          }
          if (hasY2) { leftNzY2 = false; aboveNzY2(mbX) = false }
        }
        hasCoeffsOf(mi) = anyNz

        // ---- reconstruct this MB (prediction uses UNFILTERED pixels;
        // the loop filter runs as a separate whole-frame pass) ----
        val yX = mbX * 16; val yY = mbY * 16
        if (ym != 4) {
          predBlock(yP, yStride, yX, yY, 16, ym)
          var sb = 0
          while (sb < 16) {
            idct4(blockCoeffs, sb * 16)
            addResidual(yP, yStride, yX + (sb & 3) * 4, yY + (sb >> 2) * 4,
              blockCoeffs, sb * 16)
            sb += 1
          }
        } else {
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val bx = yX + sx * 4; val by = yY + sy * 4
            // Above-right per §12.3: the right column (sx == 3) always
            // reads the MB's top edge row — replicated at the frame's
            // right edge, 127 on the top row; other columns read the
            // row directly above the subblock.
            if (sx == 3) {
              if (mbY == 0) { arBuf(0) = 127; arBuf(1) = 127; arBuf(2) = 127; arBuf(3) = 127 }
              else if (mbX == mbW - 1) {
                val v = yP((yY - 1) * yStride + yX + 15) & 0xFF
                arBuf(0) = v; arBuf(1) = v; arBuf(2) = v; arBuf(3) = v
              } else {
                var i = 0
                while (i < 4) {
                  arBuf(i) = yP((yY - 1) * yStride + yX + 16 + i) & 0xFF
                  i += 1
                }
              }
            } else {
              var i = 0
              while (i < 4) {
                arBuf(i) = px(yP, yStride, bx + 4 + i, by - 1)
                i += 1
              }
            }
            predB(bx, by, bModes(mi * 16 + sb).toInt)
            idct4(blockCoeffs, sb * 16)
            addResidual(yP, yStride, bx, by, blockCoeffs, sb * 16)
            sb += 1
          }
        }
        val cX = mbX * 8; val cY = mbY * 8
        predBlock(uP, uvStride, cX, cY, 8, uvMode(mi).toInt)
        predBlock(vP, uvStride, cX, cY, 8, uvMode(mi).toInt)
        var cb = 0
        while (cb < 4) {
          idct4(blockCoeffs, (16 + cb) * 16)
          addResidual(uP, uvStride, cX + (cb & 1) * 4, cY + (cb >> 1) * 4,
            blockCoeffs, (16 + cb) * 16)
          idct4(blockCoeffs, (20 + cb) * 16)
          addResidual(vP, uvStride, cX + (cb & 1) * 4, cY + (cb >> 1) * 4,
            blockCoeffs, (20 + cb) * 16)
          cb += 1
        }
        mbX += 1
      }
      mbY += 1
    }

    // ---- §15 loop filter (whole frame, MB raster order) ----
    if (filterLevel > 0) {
      def clampS(v: Int): Int = if (v < -128) -128 else if (v > 127) v.min(127) else v
      def u2s(v: Int): Int = v - 128
      def s2u(v: Int): Byte = {
        val c0 = clampS(v)
        (c0 + 128).toByte
      }
      // One 8-pixel segment across an edge, at position i with pixel
      // step `st` in plane p: p3 p2 p1 p0 | q0 q1 q2 q3.
      def commonAdjust(p: Array[Byte], i: Int, st: Int,
          useOuter: Boolean): Int = {
        val p1 = u2s(p(i - 2 * st) & 0xFF); val p0 = u2s(p(i - st) & 0xFF)
        val q0 = u2s(p(i) & 0xFF); val q1 = u2s(p(i + st) & 0xFF)
        var a = clampS((if (useOuter) clampS(p1 - q1) else 0) + 3 * (q0 - p0))
        val f1 = clampS(a + 4) >> 3
        val f2 = clampS(a + 3) >> 3
        p(i) = s2u(q0 - f1)
        p(i - st) = s2u(p0 + f2)
        f1
      }
      def simpleThresh(p: Array[Byte], i: Int, st: Int, lim: Int): Boolean = {
        val p1 = p(i - 2 * st) & 0xFF; val p0 = p(i - st) & 0xFF
        val q0 = p(i) & 0xFF; val q1 = p(i + st) & 0xFF
        math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= lim
      }
      def normalThresh(p: Array[Byte], i: Int, st: Int, e: Int,
          in: Int): Boolean = {
        val p3 = p(i - 4 * st) & 0xFF; val p2 = p(i - 3 * st) & 0xFF
        val p1 = p(i - 2 * st) & 0xFF; val p0 = p(i - st) & 0xFF
        val q0 = p(i) & 0xFF; val q1 = p(i + st) & 0xFF
        val q2 = p(i + 2 * st) & 0xFF; val q3 = p(i + 3 * st) & 0xFF
        math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= e &&
          math.abs(p3 - p2) <= in && math.abs(p2 - p1) <= in &&
          math.abs(p1 - p0) <= in && math.abs(q1 - q0) <= in &&
          math.abs(q2 - q1) <= in && math.abs(q3 - q2) <= in
      }
      def highEdgeVar(p: Array[Byte], i: Int, st: Int, t0: Int): Boolean = {
        val p1 = p(i - 2 * st) & 0xFF; val p0 = p(i - st) & 0xFF
        val q0 = p(i) & 0xFF; val q1 = p(i + st) & 0xFF
        math.abs(p1 - p0) > t0 || math.abs(q1 - q0) > t0
      }
      def mbFilter(p: Array[Byte], i: Int, st: Int, e: Int, in: Int,
          hevT: Int): Unit = {
        if (!normalThresh(p, i, st, e, in)) return
        if (highEdgeVar(p, i, st, hevT)) { commonAdjust(p, i, st, useOuter = true); return }
        val p2 = u2s(p(i - 3 * st) & 0xFF); val p1 = u2s(p(i - 2 * st) & 0xFF)
        val p0 = u2s(p(i - st) & 0xFF); val q0 = u2s(p(i) & 0xFF)
        val q1 = u2s(p(i + st) & 0xFF); val q2 = u2s(p(i + 2 * st) & 0xFF)
        val wv = clampS(clampS(p1 - q1) + 3 * (q0 - p0))
        val a0 = (27 * wv + 63) >> 7
        p(i) = s2u(q0 - a0); p(i - st) = s2u(p0 + a0)
        val a1 = (18 * wv + 63) >> 7
        p(i + st) = s2u(q1 - a1); p(i - 2 * st) = s2u(p1 + a1)
        val a2 = (9 * wv + 63) >> 7
        p(i + 2 * st) = s2u(q2 - a2); p(i - 3 * st) = s2u(p2 + a2)
      }
      def sbFilter(p: Array[Byte], i: Int, st: Int, e: Int, in: Int,
          hevT: Int): Unit = {
        if (!normalThresh(p, i, st, e, in)) return
        val hev = highEdgeVar(p, i, st, hevT)
        val f = commonAdjust(p, i, st, useOuter = hev)
        if (!hev) {
          val a = (f + 1) >> 1
          val p1 = u2s(p(i - 2 * st) & 0xFF); val q1 = u2s(p(i + st) & 0xFF)
          p(i + st) = s2u(q1 - a)
          p(i - 2 * st) = s2u(p1 + a)
        }
      }

      var fy = 0
      while (fy < mbH) {
        var fx = 0
        while (fx < mbW) {
          val mi = fy * mbW + fx
          val seg = segOf(mi).toInt
          var lvl =
            if (!segEnabled) filterLevel
            else if (segAbsDelta) segLf(seg)
            else filterLevel + segLf(seg)
          if (lvl < 0) lvl = 0; if (lvl > 63) lvl = 63
          if (lfDeltaEnabled) {
            lvl += refLfDelta(0) // key frame: always the intra ref
            if (yMode(mi) == 4) lvl += modeLfDelta(0)
            if (lvl < 0) lvl = 0; if (lvl > 63) lvl = 63
          }
          if (lvl > 0) {
            var interior = lvl
            if (sharpness > 0) {
              interior >>= (if (sharpness > 4) 2 else 1)
              if (interior > 9 - sharpness) interior = 9 - sharpness
            }
            if (interior < 1) interior = 1
            val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
            val mbE = (lvl + 2) * 2 + interior
            val sbE = lvl * 2 + interior
            val inner = hasCoeffsOf(mi) || yMode(mi) == 4
            val yX = fx * 16; val yY = fy * 16
            val cX = fx * 8; val cY = fy * 8
            if (simpleFilter) {
              if (fx > 0) {
                var r = 0
                while (r < 16) {
                  val i = (yY + r) * yStride + yX
                  if (simpleThresh(yP, i, 1, mbE)) commonAdjust(yP, i, 1, useOuter = true)
                  r += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) {
                    val i = (yY + r) * yStride + yX + e
                    if (simpleThresh(yP, i, 1, sbE)) commonAdjust(yP, i, 1, useOuter = true)
                    r += 1
                  }
                  e += 4
                }
              }
              if (fy > 0) {
                var cx = 0
                while (cx < 16) {
                  val i = yY * yStride + yX + cx
                  if (simpleThresh(yP, i, yStride, mbE)) commonAdjust(yP, i, yStride, useOuter = true)
                  cx += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var cx = 0
                  while (cx < 16) {
                    val i = (yY + e) * yStride + yX + cx
                    if (simpleThresh(yP, i, yStride, sbE)) commonAdjust(yP, i, yStride, useOuter = true)
                    cx += 1
                  }
                  e += 4
                }
              }
            } else {
              // Normal filter: Y (16 rows/cols) + chroma (8).
              if (fx > 0) {
                var r = 0
                while (r < 16) { mbFilter(yP, (yY + r) * yStride + yX, 1, mbE, interior, hevT); r += 1 }
                r = 0
                while (r < 8) {
                  mbFilter(uP, (cY + r) * uvStride + cX, 1, mbE, interior, hevT)
                  mbFilter(vP, (cY + r) * uvStride + cX, 1, mbE, interior, hevT)
                  r += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var r = 0
                  while (r < 16) { sbFilter(yP, (yY + r) * yStride + yX + e, 1, sbE, interior, hevT); r += 1 }
                  e += 4
                }
                var r = 0
                while (r < 8) {
                  sbFilter(uP, (cY + r) * uvStride + cX + 4, 1, sbE, interior, hevT)
                  sbFilter(vP, (cY + r) * uvStride + cX + 4, 1, sbE, interior, hevT)
                  r += 1
                }
              }
              if (fy > 0) {
                var cx = 0
                while (cx < 16) { mbFilter(yP, yY * yStride + yX + cx, yStride, mbE, interior, hevT); cx += 1 }
                cx = 0
                while (cx < 8) {
                  mbFilter(uP, cY * uvStride + cX + cx, uvStride, mbE, interior, hevT)
                  mbFilter(vP, cY * uvStride + cX + cx, uvStride, mbE, interior, hevT)
                  cx += 1
                }
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  var cx = 0
                  while (cx < 16) { sbFilter(yP, (yY + e) * yStride + yX + cx, yStride, sbE, interior, hevT); cx += 1 }
                  e += 4
                }
                var cx = 0
                while (cx < 8) {
                  sbFilter(uP, (cY + 4) * uvStride + cX + cx, uvStride, sbE, interior, hevT)
                  sbFilter(vP, (cY + 4) * uvStride + cX + cx, uvStride, sbE, interior, hevT)
                  cx += 1
                }
              }
            }
          }
          fx += 1
        }
        fy += 1
      }
    }
    Some(Yuv(w, h, yStride, uvStride, yP, uP, vP))
  } catch {
    case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
        _: IllegalArgumentException =>
      None // malformed stream: drop, don't crash
  }
}
