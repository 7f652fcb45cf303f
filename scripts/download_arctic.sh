#!/bin/bash
# Download the CMU Arctic corpus (7 speakers) into $1 (default
# $HOME/data/cmu_arctic). The resulting layout (cmu_us_<spk>_arctic/wav +
# etc/txt.done.data) is what nspeech_tpu.data.corpus.load_arctic parses;
# train with:  python train.py --arctic <dir> --model taco2
set -euo pipefail

location=${1:-$HOME/data/cmu_arctic}
mkdir -p "$location"
cd "$location"

root=http://www.speech.cs.cmu.edu/cmu_arctic/packed/
speakers=(awb bdl clb jmk ksp rms slt)

for spk in "${speakers[@]}"; do
    file="cmu_us_${spk}_arctic-0.95-release.zip"
    echo "downloading $spk"
    curl -L -o "$file" "${root}${file}"
    unzip -oq "$file"
    rm -f "$file"
done
echo "done: $location"
