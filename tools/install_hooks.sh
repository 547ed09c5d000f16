#!/bin/sh
# Install repo git hooks. Run once per clone: sh tools/install_hooks.sh
cd "$(git rev-parse --show-toplevel)" || exit 1
cp tools/precommit .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (compile gate for src/ changes)"
