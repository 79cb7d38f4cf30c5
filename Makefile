# transformer-stm_tpu task runner — mirrors the reference's Makefile targets
# (reference Makefile:48-79) on top of the single CLI.

PYTHON=python3
CLI=$(PYTHON) -m transformer_stm_tpu.cli

help:
	@echo "+----------------------------- command manual ------------------------------+"
	@echo "| Prepare:                                                                  |"
	@echo "|   Pick_up_datas            IQR-filter raw labels -> Processed xlsx        |"
	@echo "| Train:                                                                    |"
	@echo "|   Train_CvT_model          (Recommended) CvT, images + parameters         |"
	@echo "|   Train_CvT_model_images   CvT, images only                               |"
	@echo "|   Train_FFN_model          FFN, parameters only                           |"
	@echo "| Test:                                                                     |"
	@echo "|   Test_CvT_model           evaluate CvT (img+par)                          |"
	@echo "|   Test_CvT_model_images    evaluate CvT (img)                              |"
	@echo "|   Test_FFN_model           evaluate FFN (par)                              |"
	@echo "| Tools:                                                                    |"
	@echo "|   memory                   CPU/RAM/TPU-HBM monitor                        |"
	@echo "|   heatmap                  Grad-CAM panels from trained weights           |"
	@echo "|   model_plot               model structure diagram                        |"
	@echo "|   bench                    throughput benchmark                           |"
	@echo "|   test                     run the pytest suite                           |"
	@echo "+---------------------------------------------------------------------------+"

Pick_up_datas:
	$(CLI) pickup

Train_CvT_model:
	$(CLI) train --inputs img+par

Train_CvT_model_images:
	$(CLI) train --inputs img

Train_FFN_model:
	$(CLI) train --inputs par

Test_CvT_model:
	$(CLI) test --inputs img+par

Test_CvT_model_images:
	$(CLI) test --inputs img

Test_FFN_model:
	$(CLI) test --inputs par

memory:
	$(CLI) memory

heatmap:
	$(CLI) heatmap

model_plot:
	$(CLI) model-plot

bench:
	$(PYTHON) bench.py

# all 20 targets at once (vmapped multi-target trainer; chunk with a
# target list to bound HBM, see scripts/train_all.py)
Train_all_targets:
	$(PYTHON) scripts/train_all.py 1000 1

Train_FFN_all:
	$(PYTHON) scripts/train_ffn_all.py 1000

# "(many)" repeat-run variance studies
Train_CvT_many:
	$(PYTHON) scripts/train_many.py 50HZ_Bm 1000 8

Train_FFN_many:
	$(PYTHON) scripts/ffn_many.py

plot_data:
	$(CLI) plot-data --freq 50HZ_Bm

test:
	$(PYTHON) -m pytest tests/ -x -q

clean:
	find . -type f -name '*.pyc' -delete
	find . -type d -name '__pycache__' -exec rm -rf {} +

.PHONY: help Pick_up_datas Train_CvT_model Train_CvT_model_images \
	Train_FFN_model Test_CvT_model Test_CvT_model_images Test_FFN_model \
	memory heatmap model_plot bench test clean Train_all_targets \
	Train_FFN_all Train_CvT_many Train_FFN_many plot_data
