#!/bin/bash
# End-to-end pipeline on the reference example data (mirrors the
# reference's example/voxpopuli/run.sh stage order and flags).
#
# Usage: bash example/run.sh [ENCODER_CKPT_DIR]
#   ENCODER_CKPT_DIR: dir with {english,germanic}.npz converted SpeechLASER
#   weights (tools/convert_torch_ckpt.py). Without it the encoder runs with
#   random weights: the pipeline exercises end to end, but freshly-computed
#   embeddings are not meaningful (the committed example embeddings are
#   still used by stage 5.4 if you point --embed_dir at them).

set -ex

metadata=${METADATA:-/tmp/svecalign_metadata.tsv}
ED=/root/reference/example/voxpopuli
if [ ! -f "$metadata" ]; then
  printf "$ED/raw_audios/en/20180313-0900-PLENARY-15_en.ogg\t$ED/raw_audios/de/20180313-0900-PLENARY-15_de.ogg\n" > "$metadata"
fi

src_lang=en
tgt_lang=de
ckpt_dir=${1:-}
out_dir=${OUT_DIR:-./outputs}

seg_dir=${out_dir}/segments
untrans_seg_dir=${out_dir}/untrans_segs
cat_seg_dir=${out_dir}/cat_segs
untrans_cat_seg_dir=${out_dir}/untrans_cat_seg_ids
embed_dir=${out_dir}/embeds
align_dir=${out_dir}/alignments

embed_args=""
if [ -n "$ckpt_dir" ]; then
  embed_args="--sl_ckpt_dir $ckpt_dir"
fi

# 4.1 VAD segmentation (energy VAD by default; --vad_model silero_jax + --vad_ckpt for weights)
python -m svecalign_tpu.preprocess.segment ${metadata} ${seg_dir} --lang ${src_lang} --vad_model energy
python -m svecalign_tpu.preprocess.segment ${metadata} ${seg_dir} --lang ${tgt_lang} --use_tgt --vad_model energy

# 4.2 untranslated-segment detection
JAX_PLATFORMS=cpu python -m svecalign_tpu.preprocess.detect_untranslate_segs ${metadata} ${untrans_seg_dir} \
    --seg_dir ${seg_dir} --src_lang ${src_lang} --tgt_lang ${tgt_lang}

# 5.1 overlap windows
python -m svecalign_tpu.seg_align.concat_segs ${metadata} ${cat_seg_dir} --seg_dir ${seg_dir} --lang ${src_lang}
python -m svecalign_tpu.seg_align.concat_segs ${metadata} ${cat_seg_dir} --seg_dir ${seg_dir} --lang ${tgt_lang} --use_tgt

# 5.2 overlap ids to ignore
python -m svecalign_tpu.seg_align.detect_untranslate_concats ${metadata} ${untrans_cat_seg_dir} \
    --seg_dir ${seg_dir} --identical_seg_dir ${untrans_seg_dir} --src_lang ${src_lang} --tgt_lang ${tgt_lang}

# 5.3 segment embedding
python -m svecalign_tpu.seg_align.embed ${metadata} ${embed_dir} --concat_dir ${cat_seg_dir} \
    --lang ${src_lang} --embed_model_type speech_laser ${embed_args} ${ckpt_dir:+--sl_ckpt_name english.npz}
python -m svecalign_tpu.seg_align.embed ${metadata} ${embed_dir} --concat_dir ${cat_seg_dir} \
    --lang ${tgt_lang} --use_tgt --embed_model_type speech_laser ${embed_args} ${ckpt_dir:+--sl_ckpt_name germanic.npz}

# 5.4 alignment
python -m svecalign_tpu.seg_align.align ${metadata} ${align_dir} \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --seg_dir ${seg_dir} --concat_dir ${cat_seg_dir} --embed_dir ${embed_dir} \
    --is_stopes_embed -a 6 --ign_indices_dir ${untrans_cat_seg_dir}

# 6.1 cost filter
python -m svecalign_tpu.postprocess.filter_by_cost ${metadata} ${align_dir}_0.7 \
    --align_dir ${align_dir} --max_cost 0.7 --src_lang ${src_lang} --tgt_lang ${tgt_lang}

# 6.2 untranslated-alignment filter
JAX_PLATFORMS=cpu python -m svecalign_tpu.postprocess.filter_untrans_align ${metadata} ${align_dir}_0.7_clean \
    --align_dir ${align_dir}_0.7 --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --seg_dir ${seg_dir} --n_proc 1 --save_audio

# 6.3 alignment concatenation
python -m svecalign_tpu.postprocess.concat_aligns ${metadata} ${align_dir}_0.7_clean_cat3 \
    --max_num_align 3 --align_dir ${align_dir}_0.7_clean --seg_dir ${seg_dir} \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} --apply_dur_cond_to_both_sides --max_dur 20.0

# 6.4 duration filter
python -m svecalign_tpu.postprocess.filter_by_dur ${metadata} ${align_dir}_0.7_clean_cat3_min1s \
    --align_dir ${align_dir}_0.7_clean_cat3 --seg_dir ${seg_dir} \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} --min_dur 1.0

# 6.5 alignment embedding (reuses overlap embeddings)
python -m svecalign_tpu.postprocess.embed_align ${metadata} ${align_dir}_0.7_clean_cat3_min1s_embed \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} --align_dir ${align_dir}_0.7_clean_cat3_min1s \
    --seg_dir ${seg_dir} --concat_seg_dir ${cat_seg_dir} --concat_seg_embed_dir ${embed_dir} \
    --embed_model_type speech_laser ${embed_args} ${ckpt_dir:+--sl_ckpt_name english.npz}
python -m svecalign_tpu.postprocess.embed_align ${metadata} ${align_dir}_0.7_clean_cat3_min1s_embed \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} --align_dir ${align_dir}_0.7_clean_cat3_min1s \
    --seg_dir ${seg_dir} --concat_seg_dir ${cat_seg_dir} --concat_seg_embed_dir ${embed_dir} \
    --embed_model_type speech_laser ${embed_args} ${ckpt_dir:+--sl_ckpt_name germanic.npz} --use_tgt

# 6.6 index build
python -m svecalign_tpu.postprocess.prep_index ${metadata} ${align_dir}_0.7_clean_cat3_min1s_embed_indexes \
    --data_dir ${align_dir}_0.7_clean_cat3_min1s_embed --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --embed_fp16 --sample_ratio 0.5 --embed_stopes
python -m svecalign_tpu.postprocess.prep_index ${metadata} ${align_dir}_0.7_clean_cat3_min1s_embed_indexes \
    --data_dir ${align_dir}_0.7_clean_cat3_min1s_embed --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --embed_fp16 --sample_ratio 0.5 --embed_stopes --use_tgt

# 6.7 margin scoring
python -m svecalign_tpu.postprocess.score_align ${metadata} ${align_dir}_0.7_clean_cat3_min1s_margin \
    --embed_dir ${align_dir}_0.7_clean_cat3_min1s_embed --align_dir ${align_dir}_0.7_clean_cat3_min1s \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --index_dir ${align_dir}_0.7_clean_cat3_min1s_embed_indexes --embed_fp16 --embed_stopes

# 6.8 tsv export
python -m svecalign_tpu.postprocess.prep_tsv ${metadata} ${align_dir}_0.7_clean_cat3_min1s_tsvs \
    --src_lang ${src_lang} --tgt_lang ${tgt_lang} \
    --align_dir ${align_dir}_0.7_clean_cat3_min1s_margin --seg_dir ${seg_dir}

# 6.9 overlap removal
python -m svecalign_tpu.postprocess.remove_overlaps \
    --output_dir ${align_dir}_0.7_clean_cat3_min1s_tsvs/${src_lang}-${tgt_lang} \
    --output_filename align.rm_overlap.tsv.gz \
    --mining_result_path ${align_dir}_0.7_clean_cat3_min1s_tsvs/${src_lang}-${tgt_lang}/align.tsv.gz \
    --min_audio_length 2000 --mining_threshold 0.0 --max_overlap 0.8

# 6.10 final sort
python -m svecalign_tpu.postprocess.sort_tsv \
    --in_tsv ${align_dir}_0.7_clean_cat3_min1s_tsvs/${src_lang}-${tgt_lang}/align.rm_overlap.tsv.gz \
    --out_tsv ${align_dir}_0.7_clean_cat3_min1s_tsvs/${src_lang}-${tgt_lang}/align.rm_overlap.sort.tsv.gz
