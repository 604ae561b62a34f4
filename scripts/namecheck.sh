#!/bin/bash
# Usage: scripts/namecheck.sh name1 name2 ...
# Prints TAKEN/free per candidate op key — NEVER truncate this output.
for n in "$@"; do
  c=$(grep -rh "\"$n\"" src/main/scala/graft/ops/*.scala | wc -l)
  if [ "$c" -gt 0 ]; then echo "TAKEN $n ($c refs)"; else echo "free  $n"; fi
done
