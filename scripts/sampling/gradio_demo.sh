# DDIM vs IADB vs BNDM comparison demo on church 64x64 — reference scripts/sampling/gradio_demo.sh
# (serves a gradio UI when gradio is installed; otherwise writes a static comparison panel)

python -m bndm_tpu.cli.demo --dataset=church_res64 --res=64 --train_or_test=test --scheduler_gamma=sigmoid --scheduler_param=1000 --nb_steps=50
