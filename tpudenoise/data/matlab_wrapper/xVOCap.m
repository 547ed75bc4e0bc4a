function ap = xVOCap(rec, prec)
% Continuous (VOC2010+) average precision: area under the
% monotonically-decreasing precision envelope.  Mirrors
% tpudenoise/eval/voc_eval.py's use_07_metric=False branch so the MATLAB
% cross-check and the python evaluator integrate the same curve.

r = [0; rec(:); 1];
p = [0; prec(:); 0];
% precision envelope: p(i) = max(p(i:end))
for i = numel(p)-1:-1:1
  p(i) = max(p(i), p(i+1));
end
% sum rectangle areas where recall steps
step = find(r(2:end) ~= r(1:end-1)) + 1;
ap = sum((r(step) - r(step-1)) .* p(step));
