# Attic: evidence-documented closed negatives, kept OFF the production
# refactor path (VERDICT r4 weak #6 / next #9).
#
# The Pallas window-kernel suite (window/winform/winkernel/winmom/halo_win)
# is the round-2/3 gather-free operator experiment: measured 0.71-0.95x the
# einsum path on the real chip (BENCH_NOTES "window kernels: CLOSED with
# evidence") and superseded structurally by the patch layouts
# (fem/patch.py, fem/patchpack.py — 29-47x). It remains importable behind
# FLOW_WINKERNEL=1 + the utils/winguard.py size guard (the Mosaic fault it
# documents begins above ~140k rows), with its regression tests still in
# the suite (tests/test_win*.py) so the negative stays reproducible.
