"""Engine-agnostic hashing constants shared by the Spark queries and the
DuckDB oracle SQL.

MinHash uses ONE md5-derived 32-bit base hash per shingle plus k universal
hash permutations ``(a_k * h + b_k) mod P`` (Carter-Wegman) instead of k
independent md5 calls — an 8× cut in hash work, and pure 64-bit-safe
integer arithmetic both engines evaluate identically
(a_k < 2^27, h < 2^32 ⇒ product < 2^59, no signed-64 overflow).
"""

MH_P = 4294967311  # smallest prime > 2^32
MH_A = [1299721, 15485863, 32452843, 49979687, 67867967, 86028121, 104395301, 122949823]
MH_B = [104729, 1299709, 15485867, 32452867, 49979693, 67867979, 86028157, 122949829]
