function results = voc_eval(devkit, comp_id, test_set, output_dir)
% Official-VOCdevkit evaluation bridge: score the detection result files
% written by VocStyleDataset._write_voc_results_file with the devkit's own
% VOCevaldet, one class at a time.  Invoked by
% tpudenoise/data/voc_like.py:_do_matlab_eval as
%   voc_eval('<devkit>', '<comp_id>', '<image_set>', '<output_dir>')
% and prints / saves per-class AP like the reference's wrapper
% (ref lib/datasets/rrData.py:271-284).

opts = get_voc_opts(devkit);
opts.testset = test_set;

n = length(opts.classes);
results = struct('class', {}, 'recall', {}, 'prec', {}, ...
                 'ap', {}, 'ap_auc', {});
for c = 1:n
  results(c) = eval_one(opts.classes{c}, opts, comp_id, output_dir);
end

aps = [results(:).ap]';
fprintf('\nVOCdevkit MATLAB eval (%s / %s)\n', comp_id, test_set);
fprintf('  per-class AP:  %s\n', sprintf('%.4f ', aps));
fprintf('  mean AP:       %.4f\n', mean(aps));

function r = eval_one(cls, opts, comp_id, output_dir)
addpath(fullfile(opts.datadir, 'VOCcode'));
tic;  % VOCevaldet reads the tic/toc timer; start it first
[recall, prec, ap] = VOCevaldet(opts, comp_id, cls, false);
ap_auc = xVOCap(recall, prec);
fprintf('!!! %s : %.4f %.4f\n', cls, ap, ap_auc);
r = struct('class', cls, 'recall', recall, 'prec', prec, ...
           'ap', ap, 'ap_auc', ap_auc);
save(fullfile(output_dir, [cls '_pr.mat']), '-struct', 'r');
rmpath(fullfile(opts.datadir, 'VOCcode'));
