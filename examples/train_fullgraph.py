"""Edge-partitioned full-graph GCN over every available chip."""
import numpy as np

from gnn_tpu.data.loaders import load_dataset
from gnn_tpu.train.fullgraph import FullGraphTrainer
from gnn_tpu.utils.normalize import build_laplacian

graph = load_dataset("synthetic:nodes=100000,deg=30,feats=128,classes=16")
lap = build_laplacian(graph.adj_full, "gcn")
mask = np.zeros(graph.adj_full.shape[0], bool)
mask[graph.train_nodes] = True
trainer = FullGraphTrainer(
    adj=lap, feats=graph.feats,
    labels_dense=np.asarray(graph.labels.todense(), np.float32),
    train_mask=mask, orders=(1, 1), nhid=128,
    num_classes=graph.num_classes, lr=0.02)
for i in range(10):
    losses = trainer.train_steps(10)
    print(f"steps {i*10 + 10}: loss {losses[-1]:.4f}", flush=True)
pred = trainer.predict()
y = np.asarray(graph.labels.todense()).argmax(1)
acc = (pred[graph.valid_nodes].argmax(1) == y[graph.valid_nodes]).mean()
print(f"val acc: {acc:.3f}")
